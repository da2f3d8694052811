"""Root logger (ref ``pyro/logger.py``)."""

import logging

default_format = "%(levelname)s \t %(message)s"
log = logging.getLogger("pyro_tpu")
default_handler = logging.StreamHandler()
default_handler.setFormatter(logging.Formatter(default_format))
log.addHandler(default_handler)
log.propagate = False
