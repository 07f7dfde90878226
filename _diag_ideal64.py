import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
src = open("_diag_ideal_plant.py").read()
src = src.replace('sc = nominal_scenario(cfg, push=(0.,0.,0.), push_window=(0,0))',
                  'sc = nominal_scenario(cfg, push=(0.,0.,0.), push_window=(0,0))\n'
                  'sc = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64) if a.dtype == jnp.float32 else a, sc)')
src = src.replace('jax.config.update("jax_platforms", "cpu")', '')
src = src.replace("import jax\n", "")
exec(src)
