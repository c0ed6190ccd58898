"""Execute every validation-book case and regenerate the committed
outputs under ``docs/book/output/``.

    python docs/book/run_all.py

Exits nonzero if any case's numbers drifted outside its stated
tolerance. Reference analog: the executed notebooks committed under
``docs/performance_book/source/external_validation/``.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import coulson  # noqa: E402
import disort7a  # noqa: E402
import korkin  # noqa: E402
import nstr_sweep  # noqa: E402

CASES = [
    ("coulson", coulson),
    ("disort7a", disort7a),
    ("korkin", korkin),
    ("nstr_sweep", nstr_sweep),
]


def main():
    failures = []
    for name, mod in CASES:
        print(f"== {name} ==", flush=True)
        path, drift = mod.run()
        print(f"wrote {path}", flush=True)
        if drift:
            failures.append((name, drift))
            for d in drift:
                print(f"DRIFT {name}: {d}", flush=True)
    if failures:
        print(f"{len(failures)} case(s) drifted")
        return 1
    print("all validation-book numbers reproduced")
    return 0


if __name__ == "__main__":
    sys.exit(main())
