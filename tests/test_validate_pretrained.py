"""Keep the north-star harness alive (VERDICT r4 #9): run
`tools/validate_pretrained.py --self-test` as part of the suite so converter
drift can never silently rot the one-command FID-parity check that runs the
day real CUB + pretrained weights land (blocked north star:
reference `src/evaluation/metrics.py:12,67`)."""
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def test_validate_pretrained_self_test(tmp_path):
    env = dict(os.environ)
    # the tool forces CPU itself (axon sitecustomize ignores JAX_PLATFORMS);
    # drop the suite's 8-device flag so its single-process run is lean
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO
    env["TMPDIR"] = str(tmp_path)  # self-test assets land under pytest tmp
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "validate_pretrained.py"),
         "--self-test", "--n-images", "16"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1500)
    assert r.returncode == 0, \
        f"--self-test failed:\n{r.stdout[-4000:]}\n{r.stderr[-2000:]}"
    assert "[PASS]" in r.stdout and "[FAIL]" not in r.stdout
