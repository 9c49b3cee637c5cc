from . import num, stats, metrics, string_, ts  # noqa: F401
