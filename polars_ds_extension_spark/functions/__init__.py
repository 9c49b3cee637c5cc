from . import eda_plots, iters, num, stats, metrics, string_, ts  # noqa: F401
