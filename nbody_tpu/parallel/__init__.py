from .mesh import make_mesh
from .sharded import ring_pairwise_accel, make_sharded_step, simulate_sharded

__all__ = ["make_mesh", "ring_pairwise_accel", "make_sharded_step",
           "simulate_sharded"]
