from . import iters, num, stats, metrics, string_, ts  # noqa: F401
