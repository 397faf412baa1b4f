"""Source-level conventions the numerics depend on.

TPU's DEFAULT matmul precision for float32 operands is bfloat16 (~8 mantissa
bits). Round 2 measured the cost of forgetting this: warp source coordinates
off by up to 0.84 px, soft-argmax decodes off by millimetres at the 2200 mm
box scale (scripts/exp_kernel_bisect.py — the packed sampler's einsum was
silently quantized on TPU while every CPU test passed). The rule, recorded
in DESIGN.md: every f32 `jnp.einsum`/`jnp.dot`/`jnp.matmul` in device code
must pass an explicit `precision=`; compute that WANTS bf16 (the conv stack)
casts its operands to bf16 explicitly instead.
"""
import pathlib
import re

PKG = pathlib.Path(__file__).resolve().parent.parent / "metro_pose3d_tpu"

_CALL = re.compile(r"jnp\.(einsum|dot|matmul|tensordot)\s*\(")


def _call_text(src: str, start: int) -> str:
    """Source text of one call, from the opening paren to its match."""
    depth = 0
    for i in range(start, len(src)):
        if src[i] == "(":
            depth += 1
        elif src[i] == ")":
            depth -= 1
            if depth == 0:
                return src[start : i + 1]
    return src[start:]


def test_every_device_matmul_names_its_precision():
    offenders = []
    for path in sorted(PKG.rglob("*.py")):
        src = path.read_text()
        for m in _CALL.finditer(src):
            call = _call_text(src, m.end() - 1)
            if "precision" not in call:
                line = src[: m.start()].count("\n") + 1
                offenders.append(f"{path.relative_to(PKG.parent)}:{line} {m.group(0)}")
    assert not offenders, (
        "f32 matmuls without explicit precision= (TPU default is bf16!):\n"
        + "\n".join(offenders)
    )
