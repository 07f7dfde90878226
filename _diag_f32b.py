import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from jax.scipy.linalg import cho_factor, cho_solve
H = jnp.asarray(np.load("/tmp/qpH.npy"), jnp.float32)
g = jnp.asarray(np.load("/tmp/qpg.npy"), jnp.float32)
C = jnp.asarray(np.load("/tmp/qpC.npy"), jnp.float32)
d = jnp.asarray(np.load("/tmp/qpd.npy"), jnp.float32)
n, m = H.shape[0], C.shape[0]
dt = jnp.float32
cs = 1.0 / jnp.maximum(jnp.max(jnp.abs(g)), 1.0)
H = H*cs; g = g*cs
d_clip, reg, mu_min, tau = 1e6, 1e-7, 1e-7, 0.95
v = jnp.zeros(n, dt); w = jnp.maximum(d, 1.0); lam = jnp.ones(m, dt)
def a2b(x, dx, t):
    a = jnp.where(dx < 0, -t*x/jnp.minimum(dx, -1e-30), 1.0)
    return jnp.minimum(1.0, jnp.min(a))
for k in range(30):
    r_d = H@v + g + C.T@lam
    r_p = C@v + w - d
    mu = jnp.dot(w, lam)/m
    D = jnp.clip(lam/w, 1e-12, d_clip)
    M = H + (C.T*D)@C + reg*jnp.eye(n, dtype=dt)
    chol = cho_factor(M)
    def newton(r_c):
        rhs = -r_d + C.T@((r_c - lam*r_p)/w)
        dv = cho_solve(chol, rhs)
        dw = -r_p - C@dv
        dlam = (-r_c - lam*dw)/w
        return dv, dw, dlam
    dv_a, dw_a, dl_a = newton(w*lam)
    ap, ad = a2b(w, dw_a, 1.0), a2b(lam, dl_a, 1.0)
    mu_aff = jnp.dot(w+ap*dw_a, lam+ad*dl_a)/m
    sigma = jnp.clip((mu_aff/jnp.maximum(mu,1e-30))**3, 0., 1.)
    r_c = w*lam + dw_a*dl_a - jnp.maximum(sigma*mu, mu_min)
    dv, dw, dl = newton(r_c)
    ap, ad = a2b(w, dw, tau), a2b(lam, dl, tau)
    ok = (jnp.all(jnp.isfinite(dv)) & jnp.all(jnp.isfinite(dw)) & jnp.all(jnp.isfinite(dl)))
    ap = jnp.where(ok, ap, 0.); ad = jnp.where(ok, ad, 0.)
    dv, dw, dl = jnp.nan_to_num(dv), jnp.nan_to_num(dw), jnp.nan_to_num(dl)
    v = v + ap*dv
    w = jnp.maximum(w + ap*dw, 1e-10)
    lam = jnp.maximum(lam + ad*dl, 1e-10)
    print(f"k={k} mu={float(mu):.3e} sig={float(sigma):.2f} ap={float(ap):.3f} ad={float(ad):.3f} ok={bool(ok)}")
