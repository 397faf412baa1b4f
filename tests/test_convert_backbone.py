"""ImageNet backbone conversion: torchvision -> flax, numerically pinned.

The strong claim under test: with `conv_padding="torch"`, a converted
torchvision ResNet reproduces torch's own feature maps to float tolerance —
so an ImageNet warm start through utils/convert_backbone.py is exact, not
approximately-right (SURVEY.md §8 hard part 1 analog for the torch path).
Uses resnet18 (same mapping machinery, 6x fewer weights -> fast on CPU).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from metro_pose3d_tpu.models.resnet import ResNet
from metro_pose3d_tpu.utils.convert_backbone import (
    apply_backbone_init,
    load_backbone_npz,
    save_backbone_npz,
    torchvision_resnet_to_flax,
)


class _TorchBasicBlock(torch.nn.Module):
    """torchvision.models.resnet.BasicBlock, replicated with identical
    module names so state_dict keys match (torchvision is not installed in
    this image; torch cpu is)."""

    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(cout)
        self.relu = torch.nn.ReLU(inplace=True)
        self.conv2 = torch.nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = torch.nn.Sequential(
                torch.nn.Conv2d(cin, cout, 1, stride, bias=False),
                torch.nn.BatchNorm2d(cout),
            )

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return self.relu(out + identity)


class _TorchResNet18Trunk(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(64)
        self.relu = torch.nn.ReLU(inplace=True)
        self.maxpool = torch.nn.MaxPool2d(3, 2, 1)
        widths = (64, 128, 256, 512)
        cin = 64
        for i, w in enumerate(widths, start=1):
            stride = 1 if i == 1 else 2
            layer = torch.nn.Sequential(
                _TorchBasicBlock(cin, w, stride), _TorchBasicBlock(w, w, 1)
            )
            setattr(self, f"layer{i}", layer)
            cin = w


def _torch_resnet18():
    torch.manual_seed(0)
    m = _TorchResNet18Trunk().eval()
    # randomize BN stats so parity isn't trivially mean=0/var=1
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.3)
                mod.running_var.uniform_(0.5, 2.0)
                mod.weight.normal_(1.0, 0.2)
                mod.bias.normal_(0, 0.2)
    return m


def _torch_trunk_features(model, x_nchw):
    """Everything up to (incl.) layer4 — the fully-convolutional trunk."""
    with torch.no_grad():
        x = model.conv1(x_nchw)
        x = model.bn1(x)
        x = model.relu(x)
        x = model.maxpool(x)
        x = model.layer1(x)
        x = model.layer2(x)
        x = model.layer3(x)
        x = model.layer4(x)
    return x.numpy()


@pytest.fixture(scope="module")
def converted():
    tm = _torch_resnet18()
    params, stats = torchvision_resnet_to_flax(tm.state_dict(), depths=(2, 2, 2, 2))
    return tm, params, stats


class TestNumericParity:
    def test_feature_map_matches_torch(self, converted):
        tm, params, stats = converted
        rng = np.random.default_rng(0)
        x = rng.normal(0, 1, (2, 64, 64, 3)).astype(np.float32)

        ref = _torch_trunk_features(tm, torch.from_numpy(x.transpose(0, 3, 1, 2)))

        net = ResNet(variant="resnet18", output_stride=32, preact=False,
                     dtype=jnp.float32, conv_padding="torch")
        variables = {"params": params, "batch_stats": stats}
        out = np.asarray(net.apply(variables, jnp.asarray(x), False))
        np.testing.assert_allclose(
            out.transpose(0, 3, 1, 2), ref, atol=2e-4, rtol=2e-4
        )

    def test_same_padding_differs_only_in_grid_shift(self, converted):
        """Sanity: with XLA SAME the outputs are close in distribution but
        NOT equal (one-pixel grid shift) — guards against the torch mode
        silently being a no-op."""
        tm, params, stats = converted
        rng = np.random.default_rng(1)
        x = rng.normal(0, 1, (1, 64, 64, 3)).astype(np.float32)
        ref = _torch_trunk_features(tm, torch.from_numpy(x.transpose(0, 3, 1, 2)))
        net = ResNet(variant="resnet18", output_stride=32, preact=False,
                     dtype=jnp.float32, conv_padding="same")
        out = np.asarray(net.apply({"params": params, "batch_stats": stats},
                                   jnp.asarray(x), False))
        assert np.abs(out.transpose(0, 3, 1, 2) - ref).max() > 1e-3


class TestRoundTrip:
    def test_npz_roundtrip(self, converted, tmp_path):
        _, params, stats = converted
        path = str(tmp_path / "backbone.npz")
        save_backbone_npz(params, stats, path)
        p2, s2 = load_backbone_npz(path)
        for tree_a, tree_b in ((params, p2), (stats, s2)):
            la = jax.tree.leaves(tree_a)
            lb = jax.tree.leaves(tree_b)
            assert len(la) == len(lb)
            for a, b in zip(la, lb):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_apply_backbone_init_into_model(self, converted, tmp_path):
        from metro_pose3d_tpu.config import Config, apply_overrides
        from metro_pose3d_tpu.models.metro import MetroModel

        _, params, stats = converted
        cfg = apply_overrides(Config(), {
            "model.backbone": "resnet18", "model.preactivation": "false",
            "model.conv_padding": "torch", "model.proc_side": "64",
            "model.compute_dtype": "float32",
        })
        model = MetroModel(cfg.model)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32),
            train=True,
        )
        new_p, new_s = apply_backbone_init(
            variables["params"], variables["batch_stats"], params, stats
        )
        got = new_p["backbone"]["conv_stem"]["kernel"]
        np.testing.assert_array_equal(got, params["conv_stem"]["kernel"])
        # heads untouched
        assert "head3d" in new_p

    def test_shape_mismatch_reported(self, converted):
        from metro_pose3d_tpu.config import Config, apply_overrides
        from metro_pose3d_tpu.models.metro import MetroModel

        _, params, stats = converted
        cfg = apply_overrides(Config(), {
            "model.backbone": "tiny", "model.proc_side": "64",
            "model.compute_dtype": "float32", "model.preactivation": "false",
        })
        model = MetroModel(cfg.model)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32),
            train=True,
        )
        with pytest.raises(ValueError, match="mismatch"):
            apply_backbone_init(
                variables["params"], variables["batch_stats"], params, stats
            )


class TestKerasV2Parity:
    """The reference's backbone family: Keras/slim ResNet-v2 (pre-act).
    Converted weights must reproduce the Keras model's own feature maps."""

    @pytest.fixture(scope="class")
    def keras_pair(self):
        tf = pytest.importorskip("tensorflow")
        keras_model = tf.keras.applications.ResNet50V2(
            weights=None, include_top=False, input_shape=(64, 64, 3)
        )
        # randomize BN stats (fresh models have mean=0/var=1: too forgiving)
        rng = np.random.default_rng(0)
        for layer in keras_model.layers:
            if "bn" in layer.name:
                g, b, m, v = layer.get_weights()
                layer.set_weights([
                    g + rng.normal(0, 0.2, g.shape).astype(np.float32),
                    b + rng.normal(0, 0.2, b.shape).astype(np.float32),
                    rng.normal(0, 0.3, m.shape).astype(np.float32),
                    rng.uniform(0.5, 2.0, v.shape).astype(np.float32),
                ])
        from metro_pose3d_tpu.utils.convert_backbone import keras_resnet_v2_to_flax

        params, stats = keras_resnet_v2_to_flax(keras_model)
        return keras_model, params, stats

    def test_feature_map_matches_keras(self, keras_pair):
        import tensorflow as tf

        keras_model, params, stats = keras_pair
        rng = np.random.default_rng(1)
        x = rng.normal(0, 1, (2, 64, 64, 3)).astype(np.float32)

        net = ResNet(variant="resnet50", output_stride=32, preact=True,
                     dtype=jnp.float32, conv_padding="keras",
                     stride_position="last", v2_biases=True)
        variables = {"params": params, "batch_stats": stats}
        out, state = net.apply(variables, jnp.asarray(x), False,
                               capture_intermediates=True, mutable=["intermediates"])
        out = np.asarray(out)

        # tight check at the FIRST block: any structural/mapping error shows
        # up exactly here, before f32 accumulation across 50 layers
        early = tf.keras.Model(
            keras_model.input,
            keras_model.get_layer("conv2_block1_out").output,
        ).predict(x, verbose=0)
        ours_early = np.asarray(
            state["intermediates"]["stage1_block1"]["__call__"][0]
        )
        np.testing.assert_allclose(ours_early, early, atol=2e-5, rtol=2e-5)

        # stage boundaries: a transcription bug anywhere (e.g. a swapped BN
        # in a late stage) trips the first boundary after it at tight
        # tolerance. Measured divergence 2026-08-16 (f32, oneDNN vs XLA CPU):
        # max abs 7e-7 / 1.2e-6 / 2.1e-6 / 1.9e-6 at the four boundaries,
        # 2.5e-6 end-to-end — tolerances carry ~50x margin (VERDICT r1 #7).
        for kname, oname in (
            ("conv3_block4_out", "stage2_block4"),
            ("conv4_block6_out", "stage3_block6"),
            ("conv5_block3_out", "stage4_block3"),
        ):
            ref_stage = tf.keras.Model(
                keras_model.input, keras_model.get_layer(kname).output
            ).predict(x, verbose=0)
            ours_stage = np.asarray(
                state["intermediates"][oname]["__call__"][0]
            )
            np.testing.assert_allclose(
                ours_stage, ref_stage, atol=1e-4, rtol=1e-4,
                err_msg=f"stage-boundary drift at {kname}",
            )

        ref = keras_model.predict(x, verbose=0)
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)
        assert np.median(np.abs(out - ref)) < 1e-5

    def test_param_tree_compatible_with_model_init(self, keras_pair):
        _, params, stats = keras_pair
        net = ResNet(variant="resnet50", output_stride=32, preact=True,
                     dtype=jnp.float32, conv_padding="keras",
                     stride_position="last", v2_biases=True)
        template = jax.eval_shape(
            lambda: net.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 64, 64, 3), jnp.float32), False)
        )
        t_shapes = jax.tree.map(lambda a: tuple(a.shape), template["params"])
        c_shapes = jax.tree.map(lambda a: tuple(np.shape(a)), params)
        assert t_shapes == c_shapes, "converted tree != model tree"


class TestBackboneInitDryRun:
    def test_full_r50_backbone_init_bitwise_roundtrip(self, tmp_path):
        """VERDICT r1 #7: the `train.backbone_init` config path at full
        ResNet-50 depth — random "pretrained" tree -> save -> create_train_state
        -> bitwise equality of every backbone leaf, heads untouched."""
        from metro_pose3d_tpu.config import Config, apply_overrides
        from metro_pose3d_tpu.models.resnet import ResNet
        from metro_pose3d_tpu.train.loop import make_optimizer
        from metro_pose3d_tpu.train.state import create_train_state

        net = ResNet(variant="resnet50", output_stride=16, preact=True,
                     dtype=jnp.float32)
        pretrained = net.init(
            jax.random.PRNGKey(99), jnp.zeros((1, 64, 64, 3), jnp.float32), False
        )
        path = str(tmp_path / "r50_imagenet.npz")
        save_backbone_npz(pretrained["params"], pretrained["batch_stats"], path)

        cfg = apply_overrides(Config(), {
            "model.backbone": "resnet50", "model.proc_side": "64",
            "model.compute_dtype": "float32",
            "train.backbone_init": path, "train.warmup_steps": "0",
        })
        state = create_train_state(cfg, make_optimizer(cfg))

        got_p = state.params["backbone"]
        got_s = state.batch_stats["backbone"]
        for tree_a, tree_b in ((pretrained["params"], got_p),
                               (pretrained["batch_stats"], got_s)):
            la, lb = jax.tree.leaves(tree_a), jax.tree.leaves(tree_b)
            assert len(la) == len(lb) and len(la) > 90  # full R50 depth
            for a, b in zip(la, lb):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert "head3d" in state.params and "head2d" in state.params
