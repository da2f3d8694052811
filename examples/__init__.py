# Regular package marker.  This file matters: tests append
# /root/reference to sys.path (for parity oracles), and that tree has
# its own regular `examples` package.  Without this __init__.py our
# examples/ is only a namespace portion, and Python's import system
# lets ANY regular package found later on sys.path win over a
# namespace portion found earlier -- so `import examples.dmm` would
# silently load the reference's dmm.py.
