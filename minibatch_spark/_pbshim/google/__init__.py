"""Namespace-merge guard for the vendored pure-Python protobuf runtime.

``minibatch_spark.compat.ensure_protobuf`` puts THIS directory's parent on
``PYTHONPATH`` (never the vendored App Engine dir itself) so descendant
Python processes resolve ``google`` here first. This __init__ then rebuilds
the package __path__ with every native ``google`` portion found on
``sys.path`` (site-packages etc.) FIRST and the vendored runtime — located
via ``MINIBATCH_SPARK_PROTOBUF_VENDORED`` — appended LAST. Result: a child
environment that has its own ``google.protobuf`` installed uses it; only
children with no protobuf at all fall back to the vendored runtime.
"""

import os
import sys

__path__ = []  # rebuilt below; this shim dir itself holds no modules
_here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for _d in sys.path:
    _g = os.path.join(_d or ".", "google")
    if os.path.isdir(_g) and os.path.abspath(_d or ".") != _here:
        __path__.append(_g)
_vendored = os.environ.get("MINIBATCH_SPARK_PROTOBUF_VENDORED", "")
if _vendored:
    _g = os.path.join(_vendored, "google")
    if os.path.isdir(_g) and _g not in __path__:
        __path__.append(_g)
del os, sys, _here, _d, _g, _vendored
