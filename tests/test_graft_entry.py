"""Driver-interface regression tests: entry() compiles, dryrun runs on a
small virtual mesh (the real driver uses 8 devices; 2 keeps CPU compile
time down while exercising the same sharded code paths)."""

import importlib.util
import os

import jax


def _load_entry():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestGraftEntry:
    def test_entry_builds_fast_and_compiles(self):
        mod = _load_entry()
        fn, args = mod.entry()
        variables, x = args
        assert x.shape == (8, 224, 224, 3)
        lowered = jax.jit(fn).lower(*args)
        assert lowered is not None  # full compile covered by dryrun below

    def test_dryrun_multichip_two_devices(self):
        mod = _load_entry()
        mod.dryrun_multichip(2)
