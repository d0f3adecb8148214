"""rep-yolo-tpu: TPU-native (JAX/XLA/Pallas/pjit) Rep-YOLO framework.

Import-time platform guard: this box's axon boot hook pins
``jax.config.jax_platforms`` to the TPU plugin *by config update*, which
silently overrides a user's ``JAX_PLATFORMS=cpu`` environment prefix —
and the plugin's backend init can block forever when its tunnel is down.
Re-assert the environment variable (the user's explicit intent) so
``JAX_PLATFORMS=cpu python -m rep_yolo_tpu.cli.train ...`` is
deterministic. No-op when env and config already agree or when a
backend already exists.
"""

import os as _os


def _honor_platform_env() -> None:
    plat = _os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    try:
        import jax as _jax

        if _jax.config.jax_platforms != plat:
            _jax.config.update("jax_platforms", plat)
    except Exception:
        pass  # backends already initialized, or jax absent: leave as-is


_honor_platform_env()
