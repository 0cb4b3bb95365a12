import numpy as np
import pytest

from scoreperformer_tpu.utils import find_closest, default, exists, or_reduce


def test_find_closest_basic():
    bins = np.array([0.0, 1.0, 2.0, 4.0, 8.0])
    values = np.array([-3.0, 0.4, 0.6, 1.4, 3.1, 100.0])
    ids = find_closest(bins, values)
    assert ids.tolist() == [0, 0, 1, 1, 3, 4]


def test_find_closest_tie_goes_right():
    # Value exactly between two bins: searchsorted(side='left') keeps the right
    # bin because the strict `<` comparison fails on equality.
    bins = np.array([0.0, 2.0])
    assert find_closest(bins, np.array([1.0])).tolist() == [1]


def test_find_closest_scalar():
    bins = np.array([1.0, 2.0, 3.0])
    assert find_closest(bins, 2.2) == 1
    assert find_closest(bins, -5.0) == 0
    assert find_closest(bins, 99.0) == 2


def test_find_closest_exact_hits():
    bins = np.array([10, 20, 30], dtype=float)
    assert find_closest(bins, np.array([10.0, 20.0, 30.0])).tolist() == [0, 1, 2]


def test_default_exists():
    assert exists(0) and exists("") and not exists(None)
    assert default(None, 5) == 5
    assert default(3, 5) == 3
    assert default(None, lambda: 7) == 7


def test_or_reduce():
    a = np.array([True, False, False])
    b = np.array([False, True, False])
    assert or_reduce([a, b]).tolist() == [True, True, False]


class TestConfigSystem:
    def test_module_config_roundtrip(self):
        from dataclasses import dataclass, field
        from scoreperformer_tpu.configs import ModuleConfig

        @dataclass
        class Inner(ModuleConfig):
            dim: int = 8

        @dataclass
        class Outer(ModuleConfig):
            name: str = "x"
            inner: Inner = field(default_factory=Inner)

        cfg = Outer.from_dict({"name": "y", "inner": {"dim": 16}, "junk": 1})
        assert cfg.name == "y"
        assert cfg.inner.dim == 16
        assert cfg.to_dict() == {"name": "y", "inner": {"dim": 16}}

    def test_missing_raises(self):
        from dataclasses import dataclass
        from scoreperformer_tpu.configs import MISSING, ModuleConfig, init_module

        @dataclass
        class C(ModuleConfig):
            dim: str = MISSING

        class M:
            def __init__(self, dim):
                self.dim = dim

        with pytest.raises(ValueError):
            init_module(M, C())
        assert init_module(M, C(dim=4)).dim == 4

    def test_init_module_filters_kwargs(self):
        from scoreperformer_tpu.configs import init_module

        class M:
            def __init__(self, a, b=2):
                self.a, self.b = a, b

        m = init_module(M, {"a": 1, "b": 3, "c": 9})
        assert (m.a, m.b) == (1, 3)

    def test_registry(self):
        from scoreperformer_tpu.configs import Registry

        reg = Registry("test")

        @reg.register("lin")
        class Lin:
            def __init__(self, dim=4):
                self.dim = dim

        obj = reg.instantiate({"_target_": "lin", "dim": 12})
        assert isinstance(obj, Lin) and obj.dim == 12
        assert "lin" in reg
        with pytest.raises(KeyError):
            reg.get("nope")


class TestYamlLoader:
    def test_base_inheritance_and_disable(self, tmp_path):
        from scoreperformer_tpu.configs import load_experiment_config

        (tmp_path / "default.yaml").write_text(
            "trainer:\n  lr: 0.001\n  epochs: 10\nmodel:\n  dim: 256\n"
        )
        (tmp_path / "exp.yaml").write_text(
            "base: default.yaml\ntrainer:\n  lr: 0.01\nmodel:\n  head:\n    _disable_: true\n    dim: 4\n"
        )
        cfg = load_experiment_config(tmp_path, "exp.yaml")
        assert cfg["trainer"]["lr"] == 0.01
        assert cfg["trainer"]["epochs"] == 10
        assert "head" not in cfg["model"]

    def test_interpolation(self, tmp_path):
        from scoreperformer_tpu.configs import load_experiment_config

        (tmp_path / "a.yaml").write_text(
            "dim: 32\nmodel:\n  width: ${dim}\n  name: d${dim}\n"
        )
        cfg = load_experiment_config(tmp_path, "a.yaml")
        assert cfg["model"]["width"] == 32
        assert cfg["model"]["name"] == "d32"

    def test_date_resolver(self, tmp_path):
        from scoreperformer_tpu.configs import load_experiment_config

        (tmp_path / "a.yaml").write_text("name: run-${date:%Y}\n")
        cfg = load_experiment_config(tmp_path, "a.yaml")
        import datetime

        assert cfg["name"] == f"run-{datetime.datetime.now().year}"


class TestHostKeyedCompileCache:
    """utils/cache.py: the persistent-compile-cache dir must be stable on one
    host and keyed by the host fingerprint (cross-host XLA:CPU AOT entries
    segfaulted on load — the dir suffix makes them unreachable)."""

    def test_stable_and_base_scoped(self):
        from scoreperformer_tpu.utils import host_cache_dir

        a = host_cache_dir()
        assert a == host_cache_dir()  # deterministic on one host
        assert a.startswith("/tmp/sp_jax_cache_")
        b = host_cache_dir("/tmp/other_base")
        assert b.startswith("/tmp/other_base_")
        assert a.split("_")[-1] == b.split("_")[-1]  # same host suffix

    def test_enable_points_jax_at_it(self):
        import jax

        from scoreperformer_tpu.utils import enable_compile_cache, host_cache_dir

        path = enable_compile_cache("/tmp/sp_jax_cache_tests")
        assert path == host_cache_dir("/tmp/sp_jax_cache_tests")
        assert jax.config.jax_compilation_cache_dir == path
