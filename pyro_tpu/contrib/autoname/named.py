"""Named data structures: address pieces of data as Pyro sites.

Ref ``pyro/contrib/autoname/named.py``: three nestable containers —
``named.Object``, ``named.List``, ``named.Dict`` — that track the address
of each leaf (e.g. ``state.xs[0].loc``) and expose in-place aliases
``sample_``/``param_`` that call :func:`pyro_tpu.sample` /
:func:`pyro_tpu.param` with that address as the site name.
"""

from __future__ import annotations

from ... import primitives as pyro


class Object:
    """Object to hold immutable latent state, addressing sites by attribute
    path (ref ``named.py:57``)."""

    def __init__(self, name):
        super().__setattr__("_name", name)
        super().__setattr__("_is_placeholder", True)

    def __str__(self):
        return super().__getattribute__("_name")

    def __getattribute__(self, key):
        try:
            return super().__getattribute__(key)
        except AttributeError:
            name = super().__getattribute__("_name")
            value = Object(f"{name}.{key}")
            super(Object, self).__setattr__(key, value)
            super(Object, value).__setattr__(
                "_set_value",
                lambda v: super(Object, self).__setattr__(key, v),
            )
            return value

    def __setattr__(self, key, value):
        name = super().__getattribute__("_name")
        if isinstance(value, (List, Dict)):
            value._set_name(f"{name}.{key}")
        elif hasattr(self, key):
            old = super().__getattribute__(key)
            if not (isinstance(old, Object) and old._is_placeholder):
                raise RuntimeError(f"Cannot overwrite {name}.{key}")
        super().__setattr__(key, value)

    def sample_(self, fn, *args, **kwargs):
        """Alias of ``pyro.sample(str(self), fn, ...)`` that also stores the
        value in place of this placeholder (ref ``named.py:111``)."""
        if not self._is_placeholder:
            raise RuntimeError(f"Cannot .sample_ an initialized {self}")
        value = pyro.sample(str(self), fn, *args, **kwargs)
        set_value = super().__getattribute__("_set_value")
        set_value(value)
        return value

    def param_(self, *args, **kwargs):
        """Alias of ``pyro.param(str(self), ...)`` (ref ``named.py:121``)."""
        if not self._is_placeholder:
            raise RuntimeError(f"Cannot .param_ an initialized {self}")
        value = pyro.param(str(self), *args, **kwargs)
        set_value = super().__getattribute__("_set_value")
        set_value(value)
        return value


class List(list):
    """List of named objects; ``.add()`` appends a fresh placeholder
    (ref ``named.py:129``)."""

    def __init__(self, name=None):
        self._name = name

    def __str__(self):
        return str(self._name)

    def _set_name(self, name):
        if self:
            raise RuntimeError(f"Cannot rename nonempty List: {name}")
        if self._name is not None:
            raise RuntimeError(
                f"Cannot rename List: {self._name} to {name}"
            )
        self._name = name

    def add(self):
        """Append one new named.Object (ref ``named.py:160``)."""
        if self._name is None:
            raise RuntimeError(
                "Cannot .add() to a List before storing it in a named"
                " structure"
            )
        i = len(self)
        value = Object(f"{self._name}[{i}]")
        super(Object, value).__setattr__(
            "_set_value", lambda v, i=i: self.__setitem__(i, v)
        )
        self.append(value)
        return value

    def __setitem__(self, pos, value):
        name = f"{self._name}[{pos}]"
        old = super().__getitem__(pos)
        if not (isinstance(old, Object) and old._is_placeholder):
            raise RuntimeError(f"Cannot overwrite {name}")
        if isinstance(value, (List, Dict)):
            value._set_name(name)
        super().__setitem__(pos, value)


class Dict(dict):
    """Dict mapping keys to named objects (ref ``named.py:195``)."""

    def __init__(self, name=None):
        self._name = name

    def __str__(self):
        return str(self._name)

    def _set_name(self, name):
        if self:
            raise RuntimeError(f"Cannot rename nonempty Dict: {name}")
        if self._name is not None:
            raise RuntimeError(
                f"Cannot rename Dict: {self._name} to {name}"
            )
        self._name = name

    def __getitem__(self, key):
        try:
            return super().__getitem__(key)
        except KeyError:
            if self._name is None:
                raise RuntimeError(
                    "Cannot access an item of a Dict before storing it "
                    "in a named structure"
                )
            value = Object(f"{self._name}[{key!r}]")
            super(Object, value).__setattr__(
                "_set_value",
                lambda v, key=key: super(Dict, self).__setitem__(key, v),
            )
            super().__setitem__(key, value)
            return value

    def __setitem__(self, key, value):
        name = f"{self._name}[{key!r}]"
        if key in self:
            old = super().__getitem__(key)
            if not (isinstance(old, Object) and old._is_placeholder):
                raise RuntimeError(f"Cannot overwrite {name}")
        if isinstance(value, (List, Dict)):
            value._set_name(name)
        super().__setitem__(key, value)
