"""Vendored pyroapi-style conformance run.

Mirrors ``/root/reference/tests/pyroapi/conftest.py``: a backend that
does not implement a capability raises ``NotImplementedError``, which
the suite records as xfail rather than failure.
"""

import pytest


def pytest_runtest_call(item):
    try:
        item.runtest()
    except NotImplementedError as e:
        pytest.xfail(str(e))
