from . import common, transforms  # noqa: F401
