"""Generate converter key-manifest fixtures (VERDICT r2 item 8).

Writes tests/fixtures/convert_keys/<family>.txt — the exact source
state-dict key list each converter expects from its real checkpoint
family (depth-true, see tests/convert_manifest_defs.py). Run after any
converter or emitter change; tests/test_convert_manifests.py fails if a
fixture drifts.

Usage: PYTHONPATH=/root/repo python tools/gen_converter_manifests.py
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tests"))
sys.path.insert(0, ROOT)


def main():
    from convert_manifest_defs import families

    outdir = os.path.join(ROOT, "tests", "fixtures", "convert_keys")
    os.makedirs(outdir, exist_ok=True)
    for name, (cfg, make_sd, _convert) in sorted(families().items()):
        sd = make_sd(cfg)
        keys = sorted(sd)
        path = os.path.join(outdir, f"{name}.txt")
        with open(path, "w") as f:
            f.write("\n".join(keys) + "\n")
        print(f"{name:24s} {len(keys):5d} keys -> {path}")


if __name__ == "__main__":
    main()
