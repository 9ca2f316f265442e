"""Doc-count drift guard: asserts the README's advertised test / query /
oracle counts equal the actual `__spark_entry__.py` registry and the
pytest collection. Run in the pre-driver gate so the contract docs can't
go stale again (round-2 verdict flagged exactly this).

Usage: python tools/check_counts.py   (exit 0 = in sync)
"""

import importlib.util
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    spec = importlib.util.spec_from_file_location(
        "e", os.path.join(REPO, "__spark_entry__.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    n_queries, n_oracles = len(m.queries()), len(m.oracle_sql())

    readme = open(os.path.join(REPO, "README.md")).read()
    doc_queries = int(re.search(r"(\d+) registered queries", readme).group(1))
    doc_oracles = int(re.search(r"(\d+) with ANSI-SQL oracles", readme).group(1))
    doc_tests = int(re.search(r"(\d+) tests:", readme).group(1))

    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
        cwd=REPO,
        capture_output=True,
        text=True,
    ).stdout
    n_tests = int(re.search(r"(\d+) tests collected", out).group(1))

    ok = True
    for label, doc, actual in [
        ("registered queries", doc_queries, n_queries),
        ("oracled queries", doc_oracles, n_oracles),
        ("tests", doc_tests, n_tests),
    ]:
        status = "ok  " if doc == actual else "FAIL"
        if doc != actual:
            ok = False
        print(f"{status} {label}: README says {doc}, actual {actual}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
