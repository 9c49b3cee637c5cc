from .pipeline import Pipeline  # noqa: F401
from .blueprint import Blueprint  # noqa: F401
from . import transforms  # noqa: F401
from .steps import (SQLStep, SortStep, GroupByAggStep, ExprStep,  # noqa: F401
                    CastBoolsStep, NanToNullStep, IntToFloatStep,
                    RenameStep, DropStep, GroupByDynAggStep)
