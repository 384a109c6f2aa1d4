from .memory import compact_params
from .profiling import profile_region, maybe_profile

__all__ = ["compact_params", "profile_region", "maybe_profile"]
