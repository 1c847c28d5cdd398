"""Show-attend-tell parity: decoder forward vs a torch reimplementation of the
reference DecoderRNN (attention_model/model.py:31-173) built from torch core
(LSTMCell/Linear/Embedding), plus ResNet50 parity vs a torch-core bottleneck ResNet,
greedy decode, vocabulary."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from construction_clip_tpu.models.lstm_captioner import (
    init_lstm_captioner, captioner_forward, generate_caption, caption_lm_loss,
    from_torch_state_dict, attention, init_state)

V, E, ATT, ENC, DEC = 40, 16, 12, 24, 20


class TorchDecoder(torch.nn.Module):
    """The reference DecoderRNN semantics, torch core only."""

    def __init__(self):
        super().__init__()
        self.embedding = torch.nn.Embedding(V, E)
        self.W = torch.nn.Linear(DEC, ATT)
        self.U = torch.nn.Linear(ENC, ATT)
        self.A = torch.nn.Linear(ATT, 1)
        self.init_h = torch.nn.Linear(ENC, DEC)
        self.init_c = torch.nn.Linear(ENC, DEC)
        self.lstm_cell = torch.nn.LSTMCell(E + ENC, DEC)
        self.fcn = torch.nn.Linear(DEC, V)

    def attend(self, features, h):
        scores = self.A(torch.tanh(self.U(features) + self.W(h).unsqueeze(1))).squeeze(2)
        alpha = torch.softmax(scores, dim=1)
        return alpha, (features * alpha.unsqueeze(2)).sum(dim=1)

    def forward(self, features, captions):
        embeds = self.embedding(captions)
        mean = features.mean(dim=1)
        h, c = self.init_h(mean), self.init_c(mean)
        preds, alphas = [], []
        for s in range(captions.shape[1] - 1):
            alpha, context = self.attend(features, h)
            h, c = self.lstm_cell(torch.cat([embeds[:, s], context], dim=1), (h, c))
            preds.append(self.fcn(h))
            alphas.append(alpha)
        return torch.stack(preds, 1), torch.stack(alphas, 1)

    def state_dict_reference_names(self):
        sd = {}
        for ours, ref in [("W", "attention.W"), ("U", "attention.U"),
                          ("A", "attention.A")]:
            sd[f"{ref}.weight"] = getattr(self, ours).weight
            sd[f"{ref}.bias"] = getattr(self, ours).bias
        for name in ("embedding", "init_h", "init_c", "fcn"):
            mod = getattr(self, name)
            sd[f"{name}.weight"] = mod.weight
            if getattr(mod, "bias", None) is not None:
                sd[f"{name}.bias"] = mod.bias
        for k in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
            sd[f"lstm_cell.{k}"] = getattr(self.lstm_cell, k)
        return sd


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(7)
    td = TorchDecoder().eval()
    params = from_torch_state_dict(td.state_dict_reference_names(), vocab_size=V)
    return td, params


def test_forward_matches_torch(pair, rng):
    td, params = pair
    feats = rng.standard_normal((3, 9, ENC)).astype(np.float32)
    caps = rng.integers(0, V, (3, 7)).astype(np.int64)
    with torch.no_grad():
        ref_logits, ref_alphas = td(torch.from_numpy(feats), torch.from_numpy(caps))
    logits, alphas = captioner_forward(params, jnp.asarray(feats),
                                       jnp.asarray(caps.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(alphas), ref_alphas.numpy(), rtol=2e-4, atol=2e-5)


def test_greedy_matches_torch_loop(pair, rng):
    td, params = pair
    feats = rng.standard_normal((1, 9, ENC)).astype(np.float32)
    # torch greedy loop (reference generate_caption :121-166)
    with torch.no_grad():
        f = torch.from_numpy(feats)
        mean = f.mean(dim=1)
        h, c = td.init_h(mean), td.init_c(mean)
        emb = td.embedding(torch.tensor([1]))
        ref = []
        for _ in range(12):
            alpha, context = td.attend(f, h)
            h, c = td.lstm_cell(torch.cat([emb, context], dim=1), (h, c))
            nxt = td.fcn(h).argmax(dim=1)
            ref.append(int(nxt))
            if int(nxt) == 2:
                break
            emb = td.embedding(nxt)
    toks, lengths, alphas = generate_caption(params, jnp.asarray(feats),
                                             sos_id=1, eos_id=2, max_len=12)
    ours = list(np.asarray(toks[0][: int(lengths[0])]))
    assert ours == ref
    assert alphas.shape == (1, 12, 9)


def test_loss_and_training_step(pair, rng):
    _, params = pair
    import optax

    feats = jnp.asarray(rng.standard_normal((4, 9, ENC)).astype(np.float32))
    caps = jnp.asarray(rng.integers(1, V, (4, 6)).astype(np.int32))

    def loss_fn(p):
        logits, _ = captioner_forward(p, feats, caps)
        return caption_lm_loss(logits, caps)

    tx = optax.adam(3e-3)
    opt_state = tx.init(params)
    p = params
    losses = []
    for _ in range(5):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, opt_state = tx.update(grads, opt_state, p)
        p = optax.apply_updates(p, updates)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_resnet50_matches_torch(rng):
    """Full ResNet-50 numerics vs a torch-core implementation (bottlenecks,
    downsample, frozen BN) through the torchvision state_dict naming."""
    from construction_clip_tpu.models.resnet import (
        resnet50_features, from_torchvision_state_dict, STAGES, WIDTHS)

    class Bottleneck(torch.nn.Module):
        def __init__(self, c_in, width, stride):
            super().__init__()
            self.conv1 = torch.nn.Conv2d(c_in, width, 1, bias=False)
            self.bn1 = torch.nn.BatchNorm2d(width)
            self.conv2 = torch.nn.Conv2d(width, width, 3, stride, 1, bias=False)
            self.bn2 = torch.nn.BatchNorm2d(width)
            self.conv3 = torch.nn.Conv2d(width, width * 4, 1, bias=False)
            self.bn3 = torch.nn.BatchNorm2d(width * 4)
            self.downsample = None
            if c_in != width * 4 or stride != 1:
                self.downsample = torch.nn.Sequential(
                    torch.nn.Conv2d(c_in, width * 4, 1, stride, bias=False),
                    torch.nn.BatchNorm2d(width * 4))

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            out = torch.relu(self.bn1(self.conv1(x)))
            out = torch.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            return torch.relu(out + idt)

    class TorchResNet(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = torch.nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = torch.nn.BatchNorm2d(64)
            self.maxpool = torch.nn.MaxPool2d(3, 2, 1)
            c_in = 64
            for s, (n, w) in enumerate(zip(STAGES, WIDTHS)):
                blocks = []
                for b in range(n):
                    blocks.append(Bottleneck(c_in, w, 2 if (s > 0 and b == 0) else 1))
                    c_in = w * 4
                setattr(self, f"layer{s + 1}", torch.nn.Sequential(*blocks))

        def forward(self, x):
            x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
            for s in range(4):
                x = getattr(self, f"layer{s + 1}")(x)
            return x

    torch.manual_seed(3)
    tm = TorchResNet().eval()
    # randomize BN stats so folding is actually tested
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.3, 0.3)
                m.running_var.uniform_(0.7, 1.5)
    params = from_torchvision_state_dict(tm.state_dict())

    imgs = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(imgs).permute(0, 3, 1, 2))
        ref = ref.permute(0, 2, 3, 1).reshape(1, -1, 2048).numpy()
    ours = np.asarray(resnet50_features(params, jnp.asarray(imgs)))
    assert ours.shape == ref.shape == (1, 4, 2048)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


def test_vocabulary():
    from construction_clip_tpu.data.vocabulary import Vocabulary

    v = Vocabulary(freq_threshold=2)
    v.build_vocabulary(["a cat sat", "a cat ran", "工人未戴 工人未戴"])
    assert v.stoi["<PAD>"] == 0 and v.stoi["<SOS>"] == 1
    assert "a" in v.stoi and "cat" in v.stoi
    assert "sat" not in v.stoi  # freq 1 < 2
    assert "工" in v.stoi  # CJK char-level
    ids = v.encode_caption("a cat sat", max_len=6)
    assert ids[0] == 1 and 2 in ids and len(ids) == 6
    assert v.decode(ids) == "a cat <UNK>"
