"""Loss parity vs torch oracles + the documented equivalence property between
the two shift-tolerant formulations on binary targets."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from beat_this_tpu.train.loss import (  # noqa: E402
    MaskedBCELoss,
    ShiftTolerantBCELoss,
    SplittedShiftTolerantBCELoss,
    bce_with_logits,
    make_losses,
)


def rand_batch(seed, b=4, t=200, beat_every=11):
    rng = np.random.RandomState(seed)
    preds = rng.randn(b, t).astype(np.float32) * 3
    targets = np.zeros((b, t), np.float32)
    targets[:, ::beat_every] = 1.0
    mask = np.ones((b, t), np.float32)
    mask[:, -30:] = 0.0
    return preds, targets, mask


def torch_shift_tolerant(preds, targets, mask, pos_weight=1.0, tol=3):
    """Independent torch implementation of the shift-tolerant weighted BCE
    (from the paper's description, Sec. 3.3)."""
    p = torch.from_numpy(preds).unsqueeze(1)
    t = torch.from_numpy(targets).unsqueeze(1)
    m = torch.from_numpy(mask).unsqueeze(1)
    spread_p = F.max_pool1d(p, 1 + 2 * tol, 1)[..., tol:-tol]
    crop_t = t[..., 2 * tol : -2 * tol]
    look_at = crop_t + (1 - F.max_pool1d(t, 1 + 4 * tol, 1))
    look_at = look_at * m[..., 2 * tol : -2 * tol]
    return F.binary_cross_entropy_with_logits(
        spread_p, crop_t, weight=look_at,
        pos_weight=torch.tensor(pos_weight),
    ).item()


def test_bce_matches_torch():
    preds, targets, mask = rand_batch(0)
    ours = float(bce_with_logits(jnp.asarray(preds), jnp.asarray(targets),
                                 jnp.asarray(mask), pos_weight=7.0))
    ref = F.binary_cross_entropy_with_logits(
        torch.from_numpy(preds), torch.from_numpy(targets),
        weight=torch.from_numpy(mask), pos_weight=torch.tensor(7.0),
    ).item()
    assert abs(ours - ref) < 1e-5


def test_masked_bce_loss():
    preds, targets, mask = rand_batch(1)
    loss = MaskedBCELoss(pos_weight=3.0)
    ours = float(loss(jnp.asarray(preds), jnp.asarray(targets), jnp.asarray(mask)))
    ref = F.binary_cross_entropy_with_logits(
        torch.from_numpy(preds), torch.from_numpy(targets),
        weight=torch.from_numpy(mask), pos_weight=torch.tensor(3.0),
    ).item()
    assert abs(ours - ref) < 1e-5


@pytest.mark.parametrize("pos_weight", [1.0, 10.0])
def test_shift_tolerant_matches_torch_oracle(pos_weight):
    preds, targets, mask = rand_batch(2)
    loss = ShiftTolerantBCELoss(pos_weight=pos_weight)
    ours = float(loss(jnp.asarray(preds), jnp.asarray(targets), jnp.asarray(mask)))
    ref = torch_shift_tolerant(preds, targets, mask, pos_weight)
    assert abs(ours - ref) < 1e-5


def test_splitted_equals_plain_on_binary_targets():
    # documented property (reference loss.py:99-102)
    preds, targets, mask = rand_batch(3)
    plain = ShiftTolerantBCELoss(pos_weight=5.0)
    split = SplittedShiftTolerantBCELoss(pos_weight=5.0)
    a = float(plain(jnp.asarray(preds), jnp.asarray(targets), jnp.asarray(mask)))
    b = float(split(jnp.asarray(preds), jnp.asarray(targets), jnp.asarray(mask)))
    assert abs(a - b) < 1e-5


def test_no_mask_and_zero_tolerance():
    preds, targets, _ = rand_batch(4)
    loss = ShiftTolerantBCELoss(pos_weight=2.0, tolerance=0)
    ours = float(loss(jnp.asarray(preds), jnp.asarray(targets)))
    # tolerance 0: no spreading/cropping, but the ignore region still applies:
    # look_at = targets + (1 - targets) = 1 everywhere
    ref = F.binary_cross_entropy_with_logits(
        torch.from_numpy(preds), torch.from_numpy(targets),
        pos_weight=torch.tensor(2.0),
    ).item()
    assert abs(ours - ref) < 1e-5


def test_make_losses_selection():
    beat, downbeat = make_losses(
        "shift_tolerant_weighted_bce", {"beat": 5, "downbeat": 9}
    )
    assert isinstance(beat, ShiftTolerantBCELoss) and beat.pos_weight == 5
    assert downbeat.pos_weight == 9
    b2, _ = make_losses("bce", {"beat": 5, "downbeat": 9})
    assert isinstance(b2, MaskedBCELoss) and b2.pos_weight == 1.0
    with pytest.raises(ValueError):
        make_losses("nope", {})
