from .profiling import profile_region, maybe_profile

__all__ = ["profile_region", "maybe_profile"]
