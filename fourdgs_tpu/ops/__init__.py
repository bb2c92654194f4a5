from . import gaussmath, sh, preprocess, binning, blend, reference_renderer  # noqa: F401
