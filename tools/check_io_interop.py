#!/usr/bin/env python3
"""Independent cross-implementation check of graft.sources.ArrowIO output:
read every .arrow IPC file in a directory with pyarrow (a DIFFERENT Arrow
implementation than the JVM one that wrote them) and report rows + schema.

Usage:
  python3 tools/check_io_interop.py <dir-written-by-ArrowIO>

Example end-to-end (writes via the Spark library, reads via pyarrow):
  sbt "runMain graft.Smoke"   # populates /tmp/graft_io/orders_arrow
  python3 tools/check_io_interop.py /tmp/graft_io/orders_arrow
"""
import glob
import sys

import pyarrow.ipc as ipc


def main():
    d = sys.argv[1]
    files = sorted(glob.glob(f"{d}/*.arrow"))
    if not files:
        print(f"FAIL: no .arrow files under {d}")
        sys.exit(1)
    total = 0
    schema = None
    for f in files:
        t = ipc.open_file(f).read_all()
        t.validate(full=True)
        if schema is None:
            schema = t.schema
        elif t.schema != schema:
            print(f"FAIL: {f} schema differs: {t.schema} != {schema}")
            sys.exit(1)
        total += t.num_rows
    print(f"PASS: pyarrow read {total} rows from {len(files)} files; "
          f"schema: {schema.to_string().replace(chr(10), ', ')}")


if __name__ == "__main__":
    main()
