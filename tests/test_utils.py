"""utils: disk cache, config overrides, reference-constant provenance."""
import os

import numpy as np
import pytest

from metro_pose3d_tpu.config import Config, apply_overrides, config_to_json, parse_cli
from metro_pose3d_tpu.utils.cache import cache_result_on_disk


class TestDiskCache:
    def test_caches_and_reuses(self, tmp_path):
        calls = []

        @cache_result_on_disk(str(tmp_path / "c_{hash}.pkl"))
        def build(n):
            calls.append(n)
            return np.arange(n)

        a = build(5)
        b = build(5)
        np.testing.assert_array_equal(a, b)
        assert calls == [5]  # second call served from disk

    def test_distinct_args_distinct_files(self, tmp_path):
        @cache_result_on_disk(str(tmp_path / "c_{hash}.pkl"))
        def build(n):
            return n * 2

        assert build(1) == 2 and build(3) == 6 and build(1) == 2
        assert len(list(tmp_path.glob("c_*.pkl"))) == 2

    def test_forced_rebuild(self, tmp_path):
        calls = []

        @cache_result_on_disk(str(tmp_path / "f_{hash}.pkl"), forced=True)
        def build():
            calls.append(1)
            return "x"

        build()
        build()
        assert len(calls) == 2


class TestConfigCli:
    def test_parse_cli_roundtrip(self):
        cfg, rest = parse_cli([
            "--model.depth=16", "--train.base_lr=0.001", "--eval.flip_tta=false",
            "--train", "positional",
        ])
        assert cfg.model.depth == 16
        assert cfg.train.base_lr == pytest.approx(1e-3)
        assert cfg.eval.flip_tta is False
        assert rest == ["--train", "positional"]

    def test_synthetic_sizes_reach_dataset(self):
        # data.synthetic_n_train/n_test must flow from the CLI into the
        # procedural dataset's split sizes (flagship receipts need more
        # distinct examples per cycled batch than the 512 default)
        from metro_pose3d_tpu.main import _get_dataset

        cfg, _ = parse_cli([
            "--data.synthetic_n_train=96", "--data.synthetic_n_test=24",
        ])
        ds = _get_dataset(cfg, "synthetic")
        assert (ds.n_train, ds.n_test) == (96, 24)

    def test_unknown_field_rejected(self):
        with pytest.raises(ValueError, match="unknown config field"):
            apply_overrides(Config(), {"model.nope": "1"})

    def test_json_dump_complete(self):
        import json

        d = json.loads(config_to_json(Config()))
        assert set(d) == {"model", "aug", "data", "train", "eval", "mesh"}
        assert d["model"]["box_size_mm"] > 0


class TestReferenceConstants:
    def test_all_constants_documented(self):
        """Every constant carries a provenance comment on its line (the
        parity contract: no bare magic numbers)."""
        import inspect

        from metro_pose3d_tpu import reference_constants as C

        src = inspect.getsource(C).splitlines()
        assigns = [
            l for l in src
            if l and not l.startswith(("#", '"', "'", "import", "from"))
            and "=" in l and l[0].isupper()
        ]
        assert len(assigns) >= 10
        for line in assigns:
            has_inline = "#" in line
            idx = src.index(line)
            has_above = idx > 0 and src[idx - 1].lstrip().startswith("#")
            assert has_inline or has_above, f"undocumented constant: {line}"
