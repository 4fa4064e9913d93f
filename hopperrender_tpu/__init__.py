"""hopperrender_tpu — TPU-native real-time optical-flow frame interpolation."""

import os

# The axon TPU platform plugin ignores the JAX_PLATFORMS environment variable; apply
# it through the config API so `JAX_PLATFORMS=cpu python -m hopperrender_tpu ...`
# behaves as documented on every backend.
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

__version__ = "0.1.0"
