"""Custom-transform SDK: the @custom decorator marks plugin functions
(reference: silver/customs/sdk.py:7-13 — sets __onedata_custom__)."""

from __future__ import annotations

MARK = "__medalforge_custom__"


def custom(fn):
    """Mark a DataFrame-in/DataFrame-out transform as a loadable custom."""
    setattr(fn, MARK, True)
    return fn
