import numpy as np
H = np.load("/tmp/qpH.npy").astype(np.float64); g = np.load("/tmp/qpg.npy").astype(np.float64)
C = np.load("/tmp/qpC.npy").astype(np.float64); d = np.load("/tmp/qpd.npy").astype(np.float64)
n, m = H.shape[0], C.shape[0]
idx = np.arange(320, n)
H[idx, idx] += 1.0
fac = np.minimum(1.0, 10.0/np.maximum(np.abs(d), 1e-12))
C = C*fac[:,None]; d = d*fac
# cost scaling
cs = 1.0/np.abs(g).max()
H = H*cs; g = g*cs

v = np.zeros(n); w = np.maximum(d, 1.0); lam = np.ones(m)
for k in range(25):
    r_d = H@v + g + C.T@lam
    r_p = C@v + w - d
    mu = w@lam/m
    Dn = np.clip(lam/w, 1e-12, 1e12)
    M = H + (C.T*Dn)@C + 1e-10*np.eye(n)
    cf = np.linalg.cholesky(M)
    def newton(r_c):
        rhs = -r_d + C.T@((r_c - lam*r_p)/w)
        dv = np.linalg.solve(cf.T, np.linalg.solve(cf, rhs))
        dw = -r_p - C@dv
        dlam = (-r_c - lam*dw)/w
        return dv, dw, dlam
    def a2b(x, dx, t):
        msk = dx < 0
        if not msk.any(): return 1.0, -1
        r = t*(-x[msk]/dx[msk]); i = np.argmin(r)
        return min(1.0, r[i]), np.where(msk)[0][i]
    dv, dw, dl = newton(w*lam)
    ap, _ = a2b(w, dw, 1.0); ad, _ = a2b(lam, dl, 1.0)
    mu_aff = (w+ap*dw)@(lam+ad*dl)/m
    sigma = np.clip((mu_aff/max(mu,1e-30))**3, 0.0, 1.0)
    r_c = w*lam + dw*dl - max(sigma*mu, 1e-12)
    dv, dw, dl = newton(r_c)
    ap, ip = a2b(w, dw, 0.95); ad, idd = a2b(lam, dl, 0.95)
    print(f"k={k:2d} mu={mu:.2e} |r_p|={np.abs(r_p).max():.1e} |r_d|={np.abs(r_d).max():.1e} ap={ap:.3f}({ip}) ad={ad:.3f}({idd}) sig={sigma:.2f}")
    v += ap*dv; w += ap*dw; lam += ad*dl
