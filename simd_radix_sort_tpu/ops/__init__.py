from . import radix, rank_sort, sort, xla_sort  # noqa: F401
