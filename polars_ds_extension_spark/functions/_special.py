"""Pure-python special functions for p-values (no scipy in this env).

Used driver-side on aggregated statistics (k numbers), never on rows —
the distributed work always reduces to sufficient statistics first.

Algorithms are the standard public formulations: Lentz's continued
fraction for the regularized incomplete beta, series + continued
fraction for the regularized incomplete gamma, and the asymptotic
Kolmogorov distribution.
"""

from __future__ import annotations

import math

_EPS = 3e-16
_FPMIN = 1e-300
_MAX_ITER = 500


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for incomplete beta (modified Lentz)."""
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < _FPMIN:
        d = _FPMIN
    d = 1.0 / d
    h = d
    for m in range(1, _MAX_ITER + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < _FPMIN:
            d = _FPMIN
        c = 1.0 + aa / c
        if abs(c) < _FPMIN:
            c = _FPMIN
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < _FPMIN:
            d = _FPMIN
        c = 1.0 + aa / c
        if abs(c) < _FPMIN:
            c = _FPMIN
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < _EPS:
            break
    return h


def betainc_reg(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_front = (
        math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
        + a * math.log(x) + b * math.log1p(-x)
    )
    front = math.exp(ln_front)
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


def gammainc_lower_reg(s: float, x: float) -> float:
    """Regularized lower incomplete gamma P(s, x)."""
    if x < 0.0 or s <= 0.0:
        return float("nan")
    if x == 0.0:
        return 0.0
    if x < s + 1.0:
        # series
        term = 1.0 / s
        total = term
        ap = s
        for _ in range(_MAX_ITER):
            ap += 1.0
            term *= x / ap
            total += term
            if abs(term) < abs(total) * _EPS:
                break
        return total * math.exp(-x + s * math.log(x) - math.lgamma(s))
    # continued fraction for Q, then P = 1 - Q
    b = x + 1.0 - s
    c = 1.0 / _FPMIN
    d = 1.0 / b
    h = d
    for i in range(1, _MAX_ITER + 1):
        an = -i * (i - s)
        b += 2.0
        d = an * d + b
        if abs(d) < _FPMIN:
            d = _FPMIN
        c = b + an / c
        if abs(c) < _FPMIN:
            c = _FPMIN
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < _EPS:
            break
    q = math.exp(-x + s * math.log(x) - math.lgamma(s)) * h
    return 1.0 - q


def gammainc_upper_reg(s: float, x: float) -> float:
    return 1.0 - gammainc_lower_reg(s, x)


# ------------------------------------------------------------- distributions

def norm_sf(z: float) -> float:
    """P(Z > z) for standard normal."""
    return 0.5 * math.erfc(z / math.sqrt(2.0))


def t_sf(t: float, df: float) -> float:
    """P(T > t) for Student t with df dof (t >= 0 gives upper tail;
    negative t handled symmetrically)."""
    if math.isnan(t):
        return float("nan")
    p_two_half = 0.5 * betainc_reg(df / 2.0, 0.5, df / (df + t * t))
    return p_two_half if t >= 0 else 1.0 - p_two_half


def chi2_sf(x: float, df: float) -> float:
    """P(X > x) for chi-square with df dof."""
    if x <= 0:
        return 1.0
    return gammainc_upper_reg(df / 2.0, x / 2.0)


def f_sf(f: float, d1: float, d2: float) -> float:
    """P(F > f) for Fisher F with (d1, d2) dof."""
    if f <= 0:
        return 1.0
    return betainc_reg(d2 / 2.0, d1 / 2.0, d2 / (d2 + d1 * f))


def ks_sf(d: float, n1: float, n2: float) -> float:
    """Two-sample KS asymptotic p-value (Kolmogorov distribution with the
    small-sample correction factor; matches scipy's mode='asymp')."""
    if d <= 0:
        return 1.0
    en = math.sqrt(n1 * n2 / (n1 + n2))
    lam = (en + 0.12 + 0.11 / en) * d
    total = 0.0
    for j in range(1, 101):
        term = 2.0 * (-1.0) ** (j - 1) * math.exp(-2.0 * j * j * lam * lam)
        total += term
        if abs(term) < 1e-16:
            break
    return min(max(total, 0.0), 1.0)


def mann_whitney_p(u: float, n1: float, n2: float,
                   tie_term: float = 0.0) -> float:
    """Two-sided normal-approximation p-value for Mann-Whitney U with
    optional tie correction (tie_term = Σ(t³−t) over tie groups)."""
    mu = n1 * n2 / 2.0
    n = n1 + n2
    var = n1 * n2 / 12.0 * ((n + 1.0) - tie_term / (n * (n - 1.0)))
    if var <= 0:
        return float("nan")
    z = (abs(u - mu) - 0.5) / math.sqrt(var)  # continuity-corrected
    return min(1.0, 2.0 * norm_sf(z))


def digamma(x: float) -> float:
    """ψ(x) via upward recurrence + asymptotic series (driver-side
    scalars; the Column version lives in num.py)."""
    if x <= 0 and float(x).is_integer():
        return float("nan")
    acc = 0.0
    while x < 6.0:
        acc -= 1.0 / x
        x += 1.0
    inv2 = 1.0 / (x * x)
    return acc + math.log(x) - 0.5 / x - inv2 * (
        1.0 / 12 - inv2 * (1.0 / 120 - inv2 * (1.0 / 252 - inv2 / 240)))
