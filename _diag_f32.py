import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from jax.scipy.linalg import cho_factor, cho_solve
H = jnp.asarray(np.load("/tmp/qpH.npy"), jnp.float32)  # saved by _diag_qp64 (new condense? check)
g = jnp.asarray(np.load("/tmp/qpg.npy"), jnp.float32)
C = jnp.asarray(np.load("/tmp/qpC.npy"), jnp.float32)
d = jnp.asarray(np.load("/tmp/qpd.npy"), jnp.float32)
n, m = H.shape[0], C.shape[0]
print("d range", float(d.min()), float(d.max()), "H max", float(jnp.abs(H).max()), "g max", float(jnp.abs(g).max()))
cs = 1.0/max(float(jnp.abs(g).max()), 1.0)
H, g = H*cs, g*cs
v = jnp.zeros(n, jnp.float32); w = jnp.maximum(d, 1.0); lam = jnp.ones(m, jnp.float32)
for k in range(20):
    r_d = H@v + g + C.T@lam
    r_p = C@v + w - d
    mu = jnp.dot(w, lam)/m
    D = jnp.clip(lam/w, 1e-12, 1e7)
    M = H + (C.T*D)@C + 1e-7*jnp.eye(n, dtype=jnp.float32)
    chol = cho_factor(M)
    def newton(r_c):
        rhs = -r_d + C.T@((r_c - lam*r_p)/w)
        dv = cho_solve(chol, rhs)
        dw = -r_p - C@dv
        dlam = (-r_c - lam*dw)/w
        return dv, dw, dlam
    def a2b(x, dx, t):
        a = jnp.where(dx < 0, -t*x/jnp.minimum(dx, -1e-30), 1.0)
        return jnp.minimum(1.0, jnp.min(a))
    dv, dw, dl = newton(w*lam)
    ap, ad = a2b(w, dw, 1.0), a2b(lam, dl, 1.0)
    mu_aff = jnp.dot(w+ap*dw, lam+ad*dl)/m
    sigma = jnp.clip((mu_aff/jnp.maximum(mu,1e-30))**3, 0., 1.)
    r_c = w*lam + dw*dl - jnp.maximum(sigma*mu, 1e-7)
    dv, dw, dl = newton(r_c)
    ap, ad = a2b(w, dw, 0.95), a2b(lam, dl, 0.95)
    v = v + ap*dv
    w = jnp.maximum(w + ap*dw, 1e-10)
    lam = jnp.maximum(lam + ad*dl, 1e-10)
    print(f"k={k} mu={float(mu):.3e} ap={float(ap):.3f} ad={float(ad):.3f} cholNaN={bool(jnp.isnan(cho_solve(chol, g)).any())} Mmax={float(jnp.abs(M).max()):.2e} vNaN={bool(jnp.isnan(v).any())}")
    if bool(jnp.isnan(v).any()): break
