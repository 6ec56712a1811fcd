"""Hand-built torch KAN-TTS Sambert reference model.

Carries the REAL kantts state-dict names (public KAN-TTS module layout:
`text_encoder.{sy,tone,syllable_flag,word_segment}_emb`, FFT blocks as
`layer_stack.{i}.slf_attn/pos_ffn`, `spk_tokenizer`/`emo_tokenizer`,
`dur/pitch/energy_predictor`, `pitch/energy_embedding.conv`,
`mel_decoder.prenet/layer_stack.{i}.pnca_attn/pos_ffn/mel_out`,
`mel_postnet.conv_stack.{i}.conv/norm` with真 BatchNorm1d) so its weights
flow through `runtime/checkpoints.py::sambert_rules` exactly like a mounted
`speech_sambert-hifigan_tts_zh-cn_16k` checkpoint would — the same lock the
other six model families have (reference load path:
tts-service/app/services/tts_service.py:164-177).

The computation mirrors `models/sambert.py` (PNCA dual X/H attention with
causal history + banded memory, outputs_per_step frame groups, prenet,
postnet residual) so converted outputs must match to float tolerance.
"""
import math

import numpy as np
import torch
from torch import nn

NEG_INF = -1e9
LN_EPS = 1e-12  # models/sambert.py uses ops.nn.layernorm (eps 1e-12)


def sinusoidal_posenc(t, d, offset=1):
    pos = torch.arange(offset, t + offset, dtype=torch.float32)[:, None]
    half = d // 2
    inv = torch.exp(torch.arange(half, dtype=torch.float32)
                    * -(math.log(10000.0) / (half - 1)))
    ang = pos * inv[None, :]
    return torch.cat([torch.sin(ang), torch.cos(ang)], dim=-1)


class SelfAttn(nn.Module):
    """FFT-block self-attention (w_qs/w_ks/w_vs/fc + layer_norm)."""

    def __init__(self, d, n_head):
        super().__init__()
        self.n_head = n_head
        self.w_qs = nn.Linear(d, d)
        self.w_ks = nn.Linear(d, d)
        self.w_vs = nn.Linear(d, d)
        self.fc = nn.Linear(d, d)
        self.layer_norm = nn.LayerNorm(d, eps=LN_EPS)

    def forward(self, x, mask):
        # pre-LN, as models/sambert.py::_transformer_layer computes
        h = self.layer_norm(x)
        b, t, d = h.shape
        nh, dk = self.n_head, d // self.n_head

        def split(z):
            return z.view(b, t, nh, dk).permute(0, 2, 1, 3)

        q, k, v = split(self.w_qs(h)), split(self.w_ks(h)), split(self.w_vs(h))
        scores = torch.matmul(q, k.transpose(-1, -2)) / math.sqrt(dk)
        scores = scores + (1.0 - mask[:, None, None, :]) * NEG_INF
        att = torch.softmax(scores, dim=-1)
        o = torch.matmul(att, v).permute(0, 2, 1, 3).reshape(b, t, d)
        return x + self.fc(o)


class PosFFN(nn.Module):
    def __init__(self, d, d_inner):
        super().__init__()
        self.w_1 = nn.Linear(d, d_inner)
        self.w_2 = nn.Linear(d_inner, d)
        self.layer_norm = nn.LayerNorm(d, eps=LN_EPS)

    def forward(self, x):
        # pre-LN residual (encoder flavor)
        return x + self.w_2(torch.relu(self.w_1(self.layer_norm(x))))


class FFTBlock(nn.Module):
    def __init__(self, d, n_head, d_inner):
        super().__init__()
        self.slf_attn = SelfAttn(d, n_head)
        self.pos_ffn = PosFFN(d, d_inner)

    def forward(self, x, mask):
        return self.pos_ffn(self.slf_attn(x, mask))


class TextEncoder(nn.Module):
    """4-stream linguistic embedding (summed) + FFT stack."""

    def __init__(self, cfg):
        super().__init__()
        d = cfg.d_model
        self.sy_emb = nn.Embedding(cfg.vocab_size, d)
        self.tone_emb = nn.Embedding(cfg.tone_size, d)
        self.syllable_flag_emb = nn.Embedding(cfg.sylfl_size, d)
        self.word_segment_emb = nn.Embedding(cfg.wseg_size, d)
        self.layer_stack = nn.ModuleList(
            [FFTBlock(d, cfg.n_heads, cfg.ffn_dim)
             for _ in range(cfg.encoder_layers)])

    def embed(self, ling):
        return (self.sy_emb(ling[..., 0]) + self.tone_emb(ling[..., 1])
                + self.syllable_flag_emb(ling[..., 2])
                + self.word_segment_emb(ling[..., 3]))


class VarPredictor(nn.Module):
    """conv1/ln1/conv2/ln2/linear variance predictor."""

    def __init__(self, d, channels, k):
        super().__init__()
        assert k % 2 == 1
        self.conv1 = nn.Conv1d(d, channels, k, padding=(k - 1) // 2)
        self.ln1 = nn.LayerNorm(channels, eps=LN_EPS)
        self.conv2 = nn.Conv1d(channels, channels, k, padding=(k - 1) // 2)
        self.ln2 = nn.LayerNorm(channels, eps=LN_EPS)
        self.linear = nn.Linear(channels, 1)

    def forward(self, x):                      # x: [B, T, D]
        h = torch.relu(self.conv1(x.transpose(1, 2))).transpose(1, 2)
        h = self.ln1(h)
        h = torch.relu(self.conv2(h.transpose(1, 2))).transpose(1, 2)
        h = self.ln2(h)
        return self.linear(h)[..., 0]          # [B, T]


class EmbConv(nn.Module):
    def __init__(self, d, k=9):
        super().__init__()
        self.conv = nn.Conv1d(1, d, k, padding=(k - 1) // 2)

    def forward(self, x):                      # x: [B, T]
        return self.conv(x[:, None, :]).transpose(1, 2)


class PNCAAttention(nn.Module):
    """Dual-source attention: causal X (decoder history) + banded H
    (frame-aligned encoder memory); concat → fc → add&norm."""

    def __init__(self, d, n_head):
        super().__init__()
        self.n_head = n_head
        self.w_qs = nn.Linear(d, d)
        self.w_ks_x = nn.Linear(d, d)
        self.w_vs_x = nn.Linear(d, d)
        self.w_ks_h = nn.Linear(d, d)
        self.w_vs_h = nn.Linear(d, d)
        self.fc = nn.Linear(2 * d, d)
        self.layer_norm = nn.LayerNorm(d, eps=LN_EPS)


class PNCADecLayer(nn.Module):
    def __init__(self, d, n_head, d_inner):
        super().__init__()
        self.pnca_attn = PNCAAttention(d, n_head)
        self.pos_ffn = PosFFN(d, d_inner)   # post-LN used in decoder


class Prenet(nn.Module):
    def __init__(self, d_in, units, d):
        super().__init__()
        self.fc1 = nn.Linear(d_in, units)
        self.fc2 = nn.Linear(units, units)
        self.proj = nn.Linear(units, d)

    def forward(self, x):
        return self.proj(torch.relu(self.fc2(torch.relu(self.fc1(x)))))


class MelPNCADecoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        d, r = cfg.d_model, cfg.outputs_per_step
        self.cfg = cfg
        self.prenet = Prenet(cfg.n_mels * r, cfg.prenet_units, d)
        self.layer_stack = nn.ModuleList(
            [PNCADecLayer(d, cfg.n_heads, cfg.ffn_dim)
             for _ in range(cfg.pnca_layers)])
        self.mel_out = nn.Linear(d, cfg.n_mels * r)

    def forward(self, memory, mem_mask):
        """memory: [B, S*r, D] frame-aligned; mem_mask: [B, S*r].
        Mirrors models/sambert.py::_pnca_scan step for step."""
        cfg = self.cfg
        b, t_mel, d = memory.shape
        r = cfg.outputs_per_step
        s = t_mel // r
        nh, dk = cfg.n_heads, d // cfg.n_heads

        def split(z):                          # [B, T, D] → [B, H, T, dk]
            return z.view(b, -1, nh, dk).permute(0, 2, 1, 3)

        KH = [split(l.pnca_attn.w_ks_h(memory)) for l in self.layer_stack]
        VH = [split(l.pnca_attn.w_vs_h(memory)) for l in self.layer_stack]
        pe = sinusoidal_posenc(s, d)
        frame_step = torch.arange(t_mel) // r

        kx = [[] for _ in self.layer_stack]    # per-layer per-step [B, D]
        vx = [[] for _ in self.layer_stack]
        prev = memory.new_zeros(b, cfg.n_mels * r)
        mels = []
        for t in range(s):
            x = self.prenet(prev) + pe[t]
            for li, layer in enumerate(self.layer_stack):
                a = layer.pnca_attn
                kx[li].append(a.w_ks_x(x))
                vx[li].append(a.w_vs_x(x))
                q = split(a.w_qs(x)[:, None, :])           # [B,H,1,dk]
                kx_l = split(torch.stack(kx[li], dim=1))   # [B,H,t+1,dk]
                vx_l = split(torch.stack(vx[li], dim=1))
                sx = torch.matmul(q, kx_l.transpose(-1, -2)) / math.sqrt(dk)
                if cfg.x_band >= 0:
                    steps = torch.arange(t + 1)
                    keep = (steps > t - cfg.x_band - 1).float()
                    sx = sx + (1.0 - keep[None, None, None, :]) * NEG_INF
                ax = torch.matmul(torch.softmax(sx, -1), vx_l)  # [B,H,1,dk]
                hmask = mem_mask.clone()
                if cfg.h_band >= 0:
                    hmask = hmask * ((frame_step - t).abs()
                                     <= cfg.h_band).float()[None]
                sh = torch.matmul(q, KH[li].transpose(-1, -2)) / math.sqrt(dk)
                sh = sh + (1.0 - hmask[:, None, None, :]) * NEG_INF
                ah = torch.matmul(torch.softmax(sh, -1), VH[li])
                att = a.fc(torch.cat([ax.reshape(b, d), ah.reshape(b, d)], -1))
                x = a.layer_norm(x + att)
                # decoder FFN is post-LN (norm_ffn after the residual)
                f = layer.pos_ffn
                x = f.layer_norm(x + f.w_2(torch.relu(f.w_1(x))))
            prev = self.mel_out(x)
            mels.append(prev)
        mel = torch.stack(mels, dim=1).reshape(b, s * r, self.cfg.n_mels)
        return mel


class PostnetConv(nn.Module):
    def __init__(self, c_in, c_out, k):
        super().__init__()
        self.conv = nn.Conv1d(c_in, c_out, k, padding=(k - 1) // 2)
        self.norm = nn.BatchNorm1d(c_out)


class PostNet(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        n, c, k = cfg.postnet_layers, cfg.postnet_channels, cfg.postnet_kernel
        assert k % 2 == 1
        convs = []
        for i in range(n):
            c_in = cfg.n_mels if i == 0 else c
            c_out = cfg.n_mels if i == n - 1 else c
            convs.append(PostnetConv(c_in, c_out, k))
        self.conv_stack = nn.ModuleList(convs)

    def forward(self, mel, mel_mask):
        r = mel.transpose(1, 2)
        for i, blk in enumerate(self.conv_stack):
            r = blk.norm(blk.conv(r))
            if i < len(self.conv_stack) - 1:
                r = torch.tanh(r)
        return (mel + r.transpose(1, 2)) * mel_mask[..., None]


class RefKanTtsSambert(nn.Module):
    """Full acoustic model with the kantts checkpoint's module tree."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.text_encoder = TextEncoder(cfg)
        self.spk_tokenizer = nn.Embedding(cfg.n_speakers, cfg.d_model)
        self.emo_tokenizer = nn.Embedding(cfg.n_emotions, cfg.d_model)
        self.dur_predictor = VarPredictor(cfg.d_model, cfg.var_channels,
                                          cfg.var_kernel)
        self.pitch_predictor = VarPredictor(cfg.d_model, cfg.var_channels,
                                            cfg.var_kernel)
        self.energy_predictor = VarPredictor(cfg.d_model, cfg.var_channels,
                                             cfg.var_kernel)
        self.pitch_embedding = EmbConv(cfg.d_model)
        self.energy_embedding = EmbConv(cfg.d_model)
        self.mel_decoder = MelPNCADecoder(cfg)
        self.mel_postnet = PostNet(cfg)

    def forward(self, ling, lengths, spk, emo, durations, t_mel):
        """ling [B,L,4] int64; durations [B,L] (teacher-forced) → dict with
        mel (post-postnet), mel_before, mel_lens."""
        cfg = self.cfg
        b, l = ling.shape[:2]
        pmask = (torch.arange(l)[None, :] < lengths[:, None]).float()
        x = self.text_encoder.embed(ling)
        x = x + sinusoidal_posenc(l, cfg.d_model)[None]
        x = x + self.spk_tokenizer(spk)[:, None, :]
        x = x + self.emo_tokenizer(emo)[:, None, :]
        for blk in self.text_encoder.layer_stack:
            x = blk(x, pmask)
        x = x * pmask[..., None]

        dur = (durations.float() * pmask).long()
        pitch = self.pitch_predictor(x) * pmask
        energy = self.energy_predictor(x) * pmask
        x = x + self.pitch_embedding(pitch)
        x = x + self.energy_embedding(energy)

        # length regulation, models/sambert.py::length_regulate formula
        ends = torch.cumsum(dur, dim=1)                    # [B, L]
        t = torch.arange(t_mel)[None, :, None]
        idx = (t >= ends[:, None, :]).sum(-1)              # [B, T]
        total = ends[:, -1:]
        mel_mask = (torch.arange(t_mel)[None, :] < total).float()
        idx = idx.clamp(max=l - 1)
        h = torch.gather(x, 1, idx[..., None].expand(-1, -1, cfg.d_model))
        h = h * mel_mask[..., None]

        mel_before = self.mel_decoder(h, mel_mask)
        mel = self.mel_postnet(mel_before, mel_mask)
        return {"mel": mel, "mel_before": mel_before,
                "mel_lens": total[:, 0].clamp(max=t_mel)}
