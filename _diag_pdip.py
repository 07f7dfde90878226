import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp
from cmpc_tpu.ops.pdip import pdip_solve, PDIPSettings

rng = np.random.default_rng(0)
n, m = 30, 50
Q = rng.normal(size=(n, n)); H = Q @ Q.T + np.eye(n)
g = rng.normal(size=n)
C = rng.normal(size=(m, n)); d = rng.uniform(0.1, 1.0, size=m)

res = jax.jit(pdip_solve, static_argnums=4)(jnp.asarray(H), jnp.asarray(g), jnp.asarray(C), jnp.asarray(d), PDIPSettings(iters=20))
# compare with scipy
from scipy.optimize import minimize
sol = minimize(lambda x: 0.5*x@H@x + g@x, np.zeros(n), jac=lambda x: H@x+g,
               constraints=[{"type":"ineq","fun":lambda x: d - C@x,"jac":lambda x: -C}],
               method="SLSQP", options={"maxiter":300,"ftol":1e-12})
print("pdip r_prim", float(res.r_prim), "r_dual", float(res.r_dual), "mu", float(res.mu))
print("obj pdip", 0.5*np.asarray(res.v)@H@np.asarray(res.v)+g@np.asarray(res.v), "obj slsqp", sol.fun)
print("x diff", np.abs(np.asarray(res.v)-sol.x).max())
