"""Text encoder providers (models/text.py) — strict-table semantics,
BERT family routing, per-token wire, and the Board wandb-or-fail policy
(reference: models/functions.py:6-94, utils/io.py:61-91)."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from afford_motion_tpu.models.text import (
    HashTextEncoder,
    TableTextEncoder,
    create_text_encoder,
)


@pytest.fixture()
def table(tmp_path):
    p = tmp_path / "table.npz"
    np.savez(
        p,
        texts=np.array(["a person walks", ""]),
        embeddings=np.stack([
            np.ones(512, np.float32), np.zeros(512, np.float32)
        ]),
    )
    return str(p)


def test_table_strict_raises_on_unknown_caption(table):
    enc = TableTextEncoder(table, strict=True)
    np.testing.assert_allclose(enc.encode(["a person walks"]), 1.0)
    with pytest.raises(KeyError, match="allow_fallback"):
        enc.encode(["a caption the table has never seen"])


def test_table_nonstrict_falls_back_with_warning(table):
    enc = TableTextEncoder(table, strict=False)
    out = enc.encode(["a caption the table has never seen"])
    ref = HashTextEncoder(512).encode(["a caption the table has never seen"])
    np.testing.assert_allclose(out, ref)


def test_create_threads_strict_flag(table):
    enc = create_text_encoder("ViT-B/32", table_path=table, strict_table=True)
    with pytest.raises(KeyError):
        enc.encode(["nope"])
    enc2 = create_text_encoder("ViT-B/32", table_path=table, strict_table=False)
    assert enc2.encode(["nope"]).shape == (1, 512)


def test_bert_family_loud_when_strict_and_no_weights():
    with pytest.raises(FileNotFoundError, match="BERT"):
        create_text_encoder(
            "bert-base-uncased", weights_dir="/nonexistent", strict_table=True
        )
    # non-strict: loud warning + hash fallback at the right dim
    enc = create_text_encoder("bert-base-uncased", weights_dir="/nonexistent")
    assert enc.dim == 768


def test_encode_tokens_pooled_default():
    enc = HashTextEncoder(64)
    emb, pad = enc.encode_tokens(["x", "y", ""])
    assert emb.shape == (3, 1, 64) and pad.shape == (3, 1)
    assert not pad.any()
    np.testing.assert_allclose(emb[:, 0], enc.encode(["x", "y", ""]))


@pytest.mark.slow  # full CMDM forward, ~30s on the 1-core host
def test_cmdm_accepts_per_token_text():
    """Multi-token text (BERT wire: (B, Lt, Dt) + pad mask) flows through
    both CMDM archs; the motion slice stays aligned (reference
    cmdm.py:138-140,170-172)."""
    from afford_motion_tpu.models.cmdm import CMDM
    from afford_motion_tpu.ops import build_point_hierarchy
    from afford_motion_tpu.models.pointtransformer import (
        SCENEMAP_NSAMPLES, SCENEMAP_STRIDES,
    )

    rng = np.random.default_rng(11)
    B, N, L, D, Lt = 2, 256, 16, 66, 6
    xyz = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
    pad = np.zeros((B, Lt), dtype=bool)
    pad[:, 4:] = True  # last tokens are padding
    cond = {
        "text_emb": jnp.asarray(rng.normal(size=(B, Lt, 64)).astype(np.float32)),
        "text_token_mask": jnp.asarray(pad),
        "c_pc_xyz": xyz,
        "c_pc_contact": jnp.asarray(rng.normal(size=(B, N, 6)).astype(np.float32)),
        "levels_sm": build_point_hierarchy(xyz, SCENEMAP_STRIDES, SCENEMAP_NSAMPLES),
        "x_mask": jnp.zeros((B, L), dtype=bool),
        "c_text_mask": jnp.zeros((B, 1), dtype=bool),
    }
    x = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
    t = jnp.array([3, 5])
    for arch, nl in (("trans_enc", (1, 1)), ("trans_dec", (1, 1, 1))):
        model = CMDM(
            motion_dim=D, latent_dim=64, time_emb_dim=64, text_feat_dim=64,
            contact_dim=6, planes=(16, 32, 64, 128), blocks=(2, 2, 2, 2),
            arch=arch, num_layers=nl, num_heads=4, dim_feedforward=128,
        )
        variables = model.init(jax.random.PRNGKey(0), x, t, cond)
        out = model.apply(variables, x, t, cond)
        assert out.shape == (B, L, D)


def test_host_prepare_cond_ships_token_mask_for_per_token_encoder():
    from afford_motion_tpu.models.conditioning import host_prepare_cond

    class FakeTokenEncoder(HashTextEncoder):
        per_token = True

        def encode_tokens(self, texts):
            B = len(texts)
            return (
                np.ones((B, 4, self.dim), np.float32),
                np.zeros((B, 4), bool),
            )

    batch = {
        "x": np.zeros((2, 8, 66), np.float32),
        "c_text": ["a", "b"],
    }
    x, cond = host_prepare_cond(batch, FakeTokenEncoder(64))
    assert cond["text_emb"].shape == (2, 4, 64)
    assert cond["text_token_mask"].shape == (2, 4)


def test_board_wandb_fails_loudly(tmp_path):
    """platform: wandb without the wandb package must raise, not silently
    fall back to JSONL (reference: utils/io.py:61-91)."""
    pytest.importorskip_ = None
    try:
        import wandb  # noqa: F401
        pytest.skip("wandb installed; loud-failure path not applicable")
    except ImportError:
        pass
    from afford_motion_tpu.utils.io import Board

    board = Board()
    with pytest.raises(RuntimeError, match="wandb"):
        board.create_board("wandb", log_dir=str(tmp_path))
    # tensorboard/jsonl still fine afterwards
    board.create_board("jsonl", log_dir=str(tmp_path))
    board.write({"train/loss": 1.0, "step": 1})
    board.close()
