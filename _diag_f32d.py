import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
import functools
from jax.scipy.linalg import cho_factor, cho_solve
_mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
H = jnp.asarray(np.load("/tmp/qpH.npy"), jnp.float32)
g = jnp.asarray(np.load("/tmp/qpg.npy"), jnp.float32)
C = jnp.asarray(np.load("/tmp/qpC.npy"), jnp.float32)
d = jnp.asarray(np.load("/tmp/qpd.npy"), jnp.float32)
n, m = H.shape[0], C.shape[0]
dt = H.dtype
f32 = dt == jnp.float32
cs = 1.0 / jnp.maximum(jnp.max(jnp.abs(g)), 1.0)
H = H * cs; g = g * cs
d_clip = jnp.minimum(1e8, 1e6) if f32 else 1e8
reg = max(1e-8, 1e-7) if f32 else 1e-8
mu_min = max(1e-9, 1e-7) if f32 else 1e-9
tau = 0.95
v = jnp.zeros(n, dt); w = jnp.maximum(d, 1.0); lam = jnp.ones(m, dt)

def alpha_to_boundary(x, dx, tau):
    a = jnp.where(dx < 0, -tau * x / jnp.minimum(dx, -1e-30), 1.0)
    return jnp.minimum(1.0, jnp.min(a))

for k in range(15):
    r_d = _mm(H, v) + g + _mm(C.T, lam)
    r_p = _mm(C, v) + w - d
    mu = jnp.dot(w, lam) / m
    dscale = jnp.clip(lam / w, 1e-12, jnp.asarray(d_clip, dt))
    M = H + _mm(C.T * dscale, C) + jnp.asarray(reg, dt) * jnp.eye(n, dtype=dt)
    chol = cho_factor(M)
    def newton(r_c):
        rhs = -r_d + _mm(C.T, (r_c - lam * r_p) / w)
        dv = cho_solve(chol, rhs)
        dw = -r_p - _mm(C, dv)
        dlam = (-r_c - lam * dw) / w
        return dv, dw, dlam
    dv_a, dw_a, dlam_a = newton(w * lam)
    a_p = alpha_to_boundary(w, dw_a, 1.0)
    a_d = alpha_to_boundary(lam, dlam_a, 1.0)
    mu_aff = jnp.dot(w + a_p * dw_a, lam + a_d * dlam_a) / m
    sigma = jnp.clip((mu_aff / jnp.maximum(mu, 1e-30)) ** 3, 0.0, 1.0)
    mu_t = jnp.maximum(sigma * mu, mu_min)
    r_c = w * lam + dw_a * dlam_a - mu_t
    dv, dw, dlam = newton(r_c)
    a_p = alpha_to_boundary(w, dw, tau)
    a_d = alpha_to_boundary(lam, dlam, tau)
    ok = (jnp.all(jnp.isfinite(dv)) & jnp.all(jnp.isfinite(dw)) & jnp.all(jnp.isfinite(dlam)))
    a_p = jnp.where(ok, a_p, 0.0); a_d = jnp.where(ok, a_d, 0.0)
    dv = jnp.nan_to_num(dv); dw = jnp.nan_to_num(dw); dlam = jnp.nan_to_num(dlam)
    eps_pos = jnp.asarray(1e-10 if f32 else 1e-14, dt)
    v = v + a_p * dv
    w = jnp.maximum(w + a_p * dw, eps_pos)
    lam = jnp.maximum(lam + a_d * dlam, eps_pos)
    print(f"k={k} mu={float(mu):.3e} sig={float(sigma):.3f} ap={float(a_p):.3f} ad={float(a_d):.3f} ok={bool(ok)} muaff={float(mu_aff):.2e}")
print("final mu", float(jnp.dot(w, lam)/m))
