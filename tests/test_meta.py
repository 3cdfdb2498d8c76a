"""Guard: the CI shard matrix must cover every test file — a new test file
that lands in no shard would silently never run in CI."""

import glob
import os
import re


def test_ci_shards_cover_all_test_files():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    wf = open(os.path.join(root, ".github", "workflows", "tests.yml")).read()
    listed = set(re.findall(r"tests/(test_\w+\.py)", wf))
    present = {
        os.path.basename(p)
        for p in glob.glob(os.path.join(root, "tests", "test_*.py"))
    }
    missing = present - listed
    assert not missing, f"test files missing from CI shards: {sorted(missing)}"
