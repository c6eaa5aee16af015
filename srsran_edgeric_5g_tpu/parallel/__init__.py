"""Device-mesh parallelism: axis conventions and sharded slot pipelines.

The reference scales by threads and SIMD lanes inside one host
(SURVEY.md §2.4); the TPU build scales by sharding over a jax Mesh:

  axis 'ue'   — UEs / carriers (spatial partitioning; reference per-cell pools)
  axis 'cb'   — codeblock data parallelism (reference fork_cb_batches)

and lets XLA SPMD insert the ICI collectives (psum of per-UE grid
contributions, all_gather of decode results).
"""

from .mesh import make_mesh, UE_AXIS, CB_AXIS  # noqa: F401
