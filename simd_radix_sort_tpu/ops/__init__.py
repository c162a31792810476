from . import (  # noqa: F401
    counting,
    quick_sort,
    radix,
    rank_sort,
    sort,
    xla_sort,
)
from .quick_sort import partition  # noqa: F401
