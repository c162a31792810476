from . import (  # noqa: F401
    counting,
    quick_sort,
    radix,
    rank_sort,
    sort,
    topk,
    xla_sort,
)
from .quick_sort import partition  # noqa: F401
from .topk import top_k, unique  # noqa: F401
