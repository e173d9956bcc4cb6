"""Dev utility: verify the driver contract entry() compiles on the TPU."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import __graft_entry__ as ge
fn, args = ge.entry()
out = jax.jit(fn)(*args)
jax.block_until_ready(out)
print("entry() compiled and ran on", jax.default_backend(),
      [o.shape for o in out])
