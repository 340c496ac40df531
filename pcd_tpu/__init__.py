"""pcd_tpu: a TPU-native proof-carrying-data (PCD/IVC) proving framework.

Capability-parity rebuild of arkworks-rs/pcd (reference mounted read-only at
/root/reference), redesigned TPU-first: circuit synthesis and protocol glue
run on a Python host layer; witness evaluation, MSM, FFT and batched curve
arithmetic run as JAX/XLA/Pallas tensor programs over jax.sharding meshes.
"""

__version__ = "0.1.0"


def _enable_compilation_cache():
    """Persistent XLA compilation cache — the limb-arithmetic programs are
    expensive to compile; cache them across processes/rounds."""
    import os

    try:
        import jax

        cache = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compilation_cache()
