#!/usr/bin/env python
"""Run profile_step for several execution-mode combos in ONE process.

The tunneled TPU blocks for ~10-45 min after every process exit
(CLAUDE.md), so separate profile invocations pay that per mode; this
runner reuses one process (and one backend connection) for all of them.
"""

import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import tools.profile_step as ps

COMBOS = [
    ["--precision", "default", "--sampling-precision", "default",
     "--activation-dtype", "bfloat16"],
    ["--precision", "default", "--sampling-precision", "default",
     "--jac-mode", "linearize"],
    ["--precision", "default", "--sampling-precision", "default",
     "--jac-mode", "linearize", "--activation-dtype", "bfloat16"],
]


def main():
    extra = sys.argv[1:]
    for combo in COMBOS:
        print(f"# profile_modes: {' '.join(combo)}", flush=True)
        sys.argv = ["profile_step.py", *combo, *extra]
        try:
            ps.main()
        except Exception as e:  # keep going; later combos still measure
            print(f'{{"error": {str(e)[:160]!r}, "combo": "{" ".join(combo)}"}}',
                  flush=True)


if __name__ == "__main__":
    main()
