from .forces import pairwise_accel, pairwise_accel_fast
from .integrate import symplectic_euler_step

__all__ = ["pairwise_accel", "pairwise_accel_fast", "symplectic_euler_step"]
