"""shrimp-tpu: a TPU-native short-read mapper with SHRiMP2's capabilities."""
import os

try:
    import jax

    # Persistent compilation cache: the TPU backend's compile times are
    # heavy-tailed, so pay them once per kernel shape across processes.
    _cache = os.environ.get("SHRIMP_TPU_COMPILATION_CACHE",
                            os.path.expanduser("~/.cache/shrimp_tpu_xla"))
    if _cache:
        os.makedirs(_cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:  # pragma: no cover - jax config API drift
    pass
