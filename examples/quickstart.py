"""Quickstart — the reference's README walkthrough (README.rst:44-108) on
the Spark engine, runnable end-to-end on a laptop:

1. create a stream and append messages (producer side);
2. consume it with ``@streaming(name, size=2)`` — the user function sees
   ``window.data`` as a list of message dicts, exactly the reference's
   window contract;
3. forward results to a sink and drain with AvailableNow (no sleep loops).

Run:  python examples/quickstart.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from minibatch_spark.session import get_spark
from minibatch_spark.streaming.api import connectdb, stream, streaming


def main() -> None:
    spark = get_spark()
    workdir = tempfile.mkdtemp(prefix="mb-quickstart-")
    connectdb(base_dir=workdir)  # the filesystem is the broker

    # -- 1. producer ----------------------------------------------------
    s = stream("sensors")
    for i in range(10):
        s.append({"sensor": f"s{i % 3}", "reading": float(i)})
    s.flush()

    # -- 2./3. consumer: exactly-2-message windows, drained now ---------
    seen = []

    @streaming("sensors", size=2, spark=spark, available_now=True)
    def process(window):
        seen.append(window.data)
        print(f"window of {len(window.data)}: {window.data}")
        return window.data

    assert len(seen) == 5, "10 messages / size=2 => exactly 5 windows"
    print(f"OK: {len(seen)} windows of 2 (10 messages, size=2)")


if __name__ == "__main__":
    main()
