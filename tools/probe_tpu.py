"""Dev utility: one tiny TPU op to check the device/tunnel is responsive."""
import jax
import jax.numpy as jnp

print("devices:", jax.devices())
print("probe:", float(jax.jit(lambda a: (a @ a).sum())(jnp.ones((256, 256)))))
