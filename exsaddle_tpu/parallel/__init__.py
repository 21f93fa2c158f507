"""Distributed (multi-chip) runtime: slab domain decomposition over a
jax.sharding.Mesh with shard_map halo exchange and psum reductions.

See slab.py for the design; the serial<->sharded conversions live on
SlabPartition and the per-shard kernels on SlabOperator."""

from exsaddle_tpu.parallel.slab import (AXIS, SlabPartition, SlabOperator,
                                        dist_dot, dist_norm, halo_add,
                                        make_dist_mult, make_dist_fgmres)

__all__ = ["AXIS", "SlabPartition", "SlabOperator", "dist_dot", "dist_norm",
           "halo_add", "make_dist_mult", "make_dist_fgmres"]
