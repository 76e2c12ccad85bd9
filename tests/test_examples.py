"""Every examples/ script must run end-to-end against the shared
session and return a non-trivial DataFrame — the demos double as
living API documentation, so a drifted API breaks this test, not the
user following the README."""

import importlib.util
import os

import pytest

EXAMPLES = ["basic_usage", "executor_demo", "algorithms_demo",
            "import_export_demo", "storage_demo", "pipeline_demo"]

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("name", EXAMPLES)
def test_example_runs(spark, name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(ROOT, "examples", f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = mod.main(spark)
    assert out is not None and out.count() > 0
