"""Independent PyTorch oracle for cross-framework parity tests.

This is a from-scratch functional implementation of the BeatThis forward pass
written directly against torch.nn.functional, consuming a *torch-layout*
state_dict (as produced by beat_this_tpu.io.torch_ckpt.pytree_to_torch_state_dict).
It deliberately uses torch's own conv / batch_norm / scaled_dot_product_attention
kernels in the reference's NCHW conventions, so that comparing it against the
JAX model exercises every layout transpose, normalization constant and
activation choice across two independent framework implementations.

Test-only code; the framework itself never imports torch.
"""

import math

import torch
import torch.nn.functional as F


def _t(sd, key):
    return torch.as_tensor(sd[key], dtype=torch.float32)


def rms_norm(x, gamma):
    return F.normalize(x, dim=-1) * (x.shape[-1] ** 0.5) * gamma


def rope(x):
    """Interleaved RoPE over (b, h, n, d), theta=10000, full head rotation."""
    n, d = x.shape[-2], x.shape[-1]
    inv = 1.0 / (
        10000.0 ** (torch.arange(0, d, 2, dtype=torch.float64) / d)
    )
    ang = torch.outer(torch.arange(n, dtype=torch.float64), inv)
    cos = ang.cos().float()
    sin = ang.sin().float()
    xe, xo = x[..., 0::2], x[..., 1::2]
    oe = xe * cos - xo * sin
    oo = xo * cos + xe * sin
    return torch.stack([oe, oo], dim=-1).reshape(x.shape)


def attention(sd, prefix, x, heads):
    g = rms_norm(x, _t(sd, f"{prefix}.norm.gamma"))
    qkv = F.linear(g, _t(sd, f"{prefix}.to_qkv.weight"))
    b, n, _ = qkv.shape
    qkv = qkv.view(b, n, 3, heads, -1).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    q, k = rope(q), rope(k)
    out = F.scaled_dot_product_attention(q, k, v)
    gates = F.linear(
        g, _t(sd, f"{prefix}.to_gates.weight"), _t(sd, f"{prefix}.to_gates.bias")
    )
    out = out * gates.transpose(1, 2).sigmoid().unsqueeze(-1)
    out = out.transpose(1, 2).reshape(b, n, -1)
    return F.linear(out, _t(sd, f"{prefix}.to_out.0.weight"))


def feed_forward(sd, prefix, x):
    g = rms_norm(x, _t(sd, f"{prefix}.net.0.gamma"))
    h = F.linear(g, _t(sd, f"{prefix}.net.1.weight"), _t(sd, f"{prefix}.net.1.bias"))
    h = F.gelu(h)
    return F.linear(h, _t(sd, f"{prefix}.net.4.weight"), _t(sd, f"{prefix}.net.4.bias"))


def batch_norm(sd, prefix, x):
    return F.batch_norm(
        x,
        _t(sd, f"{prefix}.running_mean"),
        _t(sd, f"{prefix}.running_var"),
        _t(sd, f"{prefix}.weight"),
        _t(sd, f"{prefix}.bias"),
        training=False,
        eps=1e-5,
    )


def forward(sd, x, *, n_layers=6, head_dim=32, sum_head=True):
    """x: (B, T, 128) float32 torch tensor -> dict of (B, T) logits."""
    # stem (NCHW like the reference): (B,T,F) -> (B,F,T) -> BN1d -> (B,1,F,T)
    h = x.transpose(1, 2)
    h = batch_norm(sd, "frontend.stem.bn1d", h)
    h = h.unsqueeze(1)
    h = F.conv2d(h, _t(sd, "frontend.stem.conv2d.weight"), stride=(4, 1), padding=(0, 1))
    h = batch_norm(sd, "frontend.stem.bn2d", h)
    h = F.gelu(h)  # (B, 32, 32, T)

    for i in range(3):
        base = f"frontend.blocks.{i}"
        if f"{base}.partial.attnF.norm.gamma" in sd:
            b, c, f_bins, t = h.shape
            heads = c // head_dim
            # frequency attention on (b t) f c
            hf = h.permute(0, 3, 2, 1).reshape(b * t, f_bins, c)
            hf = hf + attention(sd, f"{base}.partial.attnF", hf, heads)
            hf = hf + feed_forward(sd, f"{base}.partial.ffF", hf)
            # time attention on (b f) t c
            ht = hf.view(b, t, f_bins, c).permute(0, 2, 1, 3).reshape(b * f_bins, t, c)
            ht = ht + attention(sd, f"{base}.partial.attnT", ht, heads)
            ht = ht + feed_forward(sd, f"{base}.partial.ffT", ht)
            h = ht.view(b, f_bins, t, c).permute(0, 3, 1, 2)
        h = F.conv2d(h, _t(sd, f"{base}.conv2d.weight"), stride=(2, 1), padding=(0, 1))
        h = batch_norm(sd, f"{base}.norm", h)
        h = F.gelu(h)

    # projection "b c f t -> b t (c f)"
    b, c, f_bins, t = h.shape
    h = h.permute(0, 3, 1, 2).reshape(b, t, c * f_bins)
    h = F.linear(h, _t(sd, "frontend.linear.weight"), _t(sd, "frontend.linear.bias"))

    heads = h.shape[-1] // head_dim
    for i in range(n_layers):
        h = h + attention(sd, f"transformer_blocks.layers.{i}.0", h, heads)
        h = h + feed_forward(sd, f"transformer_blocks.layers.{i}.1", h)
    h = rms_norm(h, _t(sd, "transformer_blocks.norm.gamma"))

    y = F.linear(
        h,
        _t(sd, "task_heads.beat_downbeat_lin.weight"),
        _t(sd, "task_heads.beat_downbeat_lin.bias"),
    )
    beat, downbeat = y[..., 0], y[..., 1]
    if sum_head:
        beat = beat + downbeat
    return {"beat": beat, "downbeat": downbeat}
