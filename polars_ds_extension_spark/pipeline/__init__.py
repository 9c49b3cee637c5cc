from .pipeline import Pipeline  # noqa: F401
from . import transforms  # noqa: F401
