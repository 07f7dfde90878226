import numpy as np

H = np.load("/tmp/qpH.npy").astype(np.float64); g = np.load("/tmp/qpg.npy").astype(np.float64)
C = np.load("/tmp/qpC.npy").astype(np.float64); d = np.load("/tmp/qpd.npy").astype(np.float64)
n, m = H.shape[0], C.shape[0]

def solve_qp(H, g, C, d, iters, init="cone", tau=0.95, verbose=False):
    if init == "cone":
        M0 = H + C.T@C + 1e-8*np.eye(n)
        v = np.linalg.solve(M0, -g + C.T@d)
        zk = C@v - d
        w = -zk; lam = zk.copy()
        aw = max(-1.5*w.min(), 0.0); w = w + aw + 1e-3
        al = max(-1.5*lam.min(), 0.0); lam = lam + al + 1e-3
    else:
        v = np.zeros(n); w = np.maximum(d, 1.0); lam = np.ones(m)
    for k in range(iters):
        r_d = H@v + g + C.T@lam
        r_p = C@v + w - d
        mu = w@lam/m
        D = np.clip(lam/w, 1e-10, 1e8)
        M = H + (C.T*D)@C + 1e-8*np.eye(n)
        cf = np.linalg.cholesky(M)
        def newton(r_c):
            rhs = -r_d + C.T@((r_c - lam*r_p)/w)
            dv = np.linalg.solve(cf.T, np.linalg.solve(cf, rhs))
            dw = -r_p - C@dv
            dlam = (-r_c - lam*dw)/w
            return dv, dw, dlam
        dv, dw, dl = newton(w*lam)
        def a2b(x, dx, t):
            msk = dx < 0
            return min(1.0, (t*(-x[msk]/dx[msk])).min()) if msk.any() else 1.0
        ap, ad = a2b(w, dw, 1.0), a2b(lam, dl, 1.0)
        mu_aff = (w+ap*dw)@(lam+ad*dl)/m
        sigma = np.clip((mu_aff/max(mu,1e-30))**3, 0, 1)
        r_c = w*lam + dw*dl - max(sigma*mu, 1e-9)
        dv, dw, dl = newton(r_c)
        ap, ad = a2b(w, dw, tau), a2b(lam, dl, tau)
        v += ap*dv; w += ap*dw; lam += ad*dl
        if verbose: print(f"  k={k} mu={w@lam/m:.3e} ap={ap:.3f} ad={ad:.3f}")
    obj = 0.5*v@H@v + g@v
    rp = np.maximum(C@v - d, 0).max()
    rd = np.abs(H@v + g + C.T@lam).max()
    return obj, rp, rd, w@lam/m, v

for init in ("plain", "cone"):
    for it in (15, 25):
        obj, rp, rd, mu, v = solve_qp(H, g, C, d, it, init=init)
        print(f"init={init:5s} iters={it}: obj={obj:.2f} r_prim={rp:.2e} r_dual={rd:.2e} mu={mu:.2e} smax={v[320:].max():.4f}")

print("--- with quadratic slack regularization ---")
H2 = H.copy()
idx = np.arange(320, n)
for w_s in (0.1, 1.0, 10.0):
    Hq = H.copy(); Hq[idx, idx] += w_s
    for it in (15, 25):
        obj, rp, rd, mu, v = solve_qp(Hq, g, C, d, it, init="cone")
        print(f"w_s={w_s:5.1f} iters={it}: obj={obj:.2f} r_prim={rp:.2e} r_dual={rd:.2e} mu={mu:.2e} smax={v[320:].max():.5f}")

print("--- verbose trace w_s=1.0 ---")
Hq = H.copy(); Hq[idx, idx] += 1.0
solve_qp(Hq, g, C, d, 25, init="cone", verbose=True)
