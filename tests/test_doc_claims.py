"""Mechanical guard against parity-doc rot.

Rounds 3 and 4 both shipped real estimator work while ``docs/PARITY.md``
kept describing the previous round's shim (stale Pallas claims, then a
stale ``has_rsample=False`` note).  This module greps the user-facing
docs for a small set of *falsifiable* claims and checks each one against
the code, so a doc that contradicts the package fails the smoke tier.
"""

import re
from pathlib import Path

import pytest

import pyro_tpu.distributions as dist

REPO = Path(__file__).resolve().parent.parent
PARITY = (REPO / "docs" / "PARITY.md").read_text()
README = (REPO / "README.md").read_text()

pytestmark = pytest.mark.stage("smoke", "unit")


def test_mixture_rsample_claim_matches_code():
    # The docs must not claim the mixtures are score-function-only: the
    # pathwise custom-VJP estimators exist (mixture_pathwise.py).
    assert "has_rsample=False" not in PARITY
    assert "has_rsample = False" not in PARITY
    assert dist.MixtureOfDiagNormals.has_rsample is True
    assert dist.MixtureOfDiagNormalsSharedCovariance.has_rsample is True
    assert dist.GaussianScaleMixture.has_rsample is True
    # and the doc row that talks about them must name the estimator files
    assert "mixture_pathwise" in PARITY
    assert "mvn_gradients" in PARITY


def test_omt_avf_use_custom_vjp_not_standard_paths():
    # Stale round-3 text said OMT/AVF "use XLA's standard paths".
    assert "XLA's standard paths" not in PARITY
    from pyro_tpu.distributions import mvn_gradients

    assert hasattr(mvn_gradients, "omt_mvn_sample")
    assert hasattr(mvn_gradients, "avf_mvn_sample")


def test_pallas_claims_are_retirement_notes_only():
    # Any doc line that mentions Pallas must describe the measured
    # retirement, not an active kernel claim.
    for name, text in (("docs/PARITY.md", PARITY), ("README.md", README)):
        lines = text.splitlines()
        for i, line in enumerate(lines):
            if re.search(r"pallas", line, re.IGNORECASE):
                window = "\n".join(lines[max(0, i - 6) : i + 7])
                assert re.search(r"retire|measured slower", window, re.IGNORECASE), (
                    f"{name}:{i + 1} makes a Pallas claim that is not a "
                    f"retirement note: {line!r}"
                )


def test_no_module_docstring_contradicts_rsample():
    from pyro_tpu.distributions import more

    doc = more.__doc__ or ""
    assert "has_rsample = False" not in doc
    assert "has_rsample=False" not in doc
    assert "custom_vjp" in doc


def test_bf16_claims_match_settings():
    # If the docs advertise a bf16/mixed-precision option, the settings
    # knob must exist (and vice versa: once the knob exists, README must
    # document it so users can find it).
    import pyro_tpu.settings as settings

    registry = getattr(settings, "_REGISTRY", {})
    has_knob = any(
        name in registry for name in ("compute_dtype", "enum_factor_dtype")
    )
    advertised = "bfloat16" in README or "bf16" in README
    assert has_knob == advertised, (
        "README bf16 advertising and the settings knob must agree "
        f"(knob={has_knob}, advertised={advertised})"
    )
    if "enum_factor_dtype" in registry:
        # the advertised knob must actually be settable and default-off
        import jax.numpy as jnp

        assert settings.get("enum_factor_dtype") is None
        with settings.context(enum_factor_dtype=jnp.bfloat16):
            assert settings.get("enum_factor_dtype") == jnp.bfloat16
        assert "enum_factor_dtype" in README, (
            "README must name the knob users set"
        )


def test_funsor_native_claim_matches_code():
    # Round 5 closed the funsor gate; docs must not still call it gated,
    # and the claimed module surface must import and work.
    assert "funsor | gated" not in PARITY
    import pyro_tpu.contrib.funsor as funsor  # must NOT raise ImportError

    assert callable(funsor.to_funsor)
    t = funsor.Tensor.__name__  # the term algebra is exported
    assert t == "Tensor"
