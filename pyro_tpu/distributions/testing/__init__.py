"""Distribution-testing support (ref ``pyro/distributions/testing/``)."""
