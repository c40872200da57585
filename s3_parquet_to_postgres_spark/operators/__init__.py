from .casts import CastPlanError, build_cast_plan
from .project import project_rename

__all__ = ["build_cast_plan", "CastPlanError", "project_rename"]
