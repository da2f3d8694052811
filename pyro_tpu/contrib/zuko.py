"""Interop wrapper for zuko normalizing flows (ref ``pyro/contrib/zuko.py``).

The external ``zuko`` package (torch-based flows) is not available in this
environment; for flow-based guides use the native flows in
``pyro_tpu.distributions.flows`` / ``transforms`` (AffineAutoregressive,
Spline, etc.) or ``AutoNormalizingFlow`` / ``AutoIAFNormal``.
"""


class ZukoToPyro:
    """Gate: raises on construction with guidance toward native flows."""

    def __init__(self, *args, **kwargs):
        raise ImportError(
            "contrib.zuko requires the external torch-based 'zuko' package, "
            "which is not installed. Use pyro_tpu.distributions.flows (e.g. "
            "AffineAutoregressive, Spline) or infer.autoguide."
            "AutoNormalizingFlow for the same functionality natively."
        )
