from .env import collect_env_info, seed_all_rng
from .memory import retry_if_oom

__all__ = ["collect_env_info", "seed_all_rng", "retry_if_oom"]
