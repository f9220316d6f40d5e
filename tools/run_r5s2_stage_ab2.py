"""Round-5 session-2 combined residual attribution, retry-resilient.

The first attempt died on a transient tunnel error (remote_compile HTTP
body closed mid-compile, logs/r5s2_ab_combined.log). Each tool's main()
is retried up to 3 times; the XLA persistent cache makes repeat compiles
cheap, so a retry costs seconds, not the 5-minute cold compile.
"""
import sys, time, traceback
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")
import ab_endonerf_parts, ab_endosurf_glue

for name, mod in (("ab_endonerf_parts", ab_endonerf_parts),
                  ("ab_endosurf_glue", ab_endosurf_glue)):
    print(f"### {name}", flush=True)
    for attempt in range(3):
        try:
            mod.main()
            break
        except Exception:
            traceback.print_exc()
            print(f"# {name} attempt {attempt} failed; sleeping 60s",
                  flush=True)
            time.sleep(60)
    else:
        print(f"# {name} FAILED after 3 attempts", flush=True)
