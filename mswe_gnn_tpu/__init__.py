"""mswe_gnn_tpu — a TPU-native multi-scale hydraulic GNN framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
sdat2/mSWE-GNN flood-surrogate stack (reference: /root/reference):

- static-shape padded graph containers (``graph.FloodGraph``) replace PyG
  ``Data``/``Batch`` objects (reference utils/dataset.py, training/train.py:14-65)
- segment gather/scatter ops + Pallas kernels replace torch_scatter CUDA kernels
- the SWEGNN hydraulic message-passing layer (reference models/gnn.py:352-451)
  is re-derived as a hop-invariant flux (SDDMM) + K segment-sum hops (SpMM)
- autoregressive rollout is a ``jax.lax.scan`` with donated carry (reference
  training/train.py:67-95)
- multi-device scaling via ``jax.sharding`` meshes: data parallelism over the
  batch axis and edge-partitioned graph parallelism with halo exchange.
"""

__version__ = "0.1.0"

NUM_WATER_VARS = 2  # water depth h and unit-discharge magnitude |q|
