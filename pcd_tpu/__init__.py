"""pcd_tpu: a TPU-native proof-carrying-data (PCD/IVC) proving framework.

Capability-parity rebuild of arkworks-rs/pcd (reference mounted read-only at
/root/reference), redesigned TPU-first: circuit synthesis and protocol glue
run on a Python host layer; witness evaluation, MSM, FFT and batched curve
arithmetic run as JAX/XLA/Pallas tensor programs over jax.sharding meshes.
"""

__version__ = "0.1.0"
