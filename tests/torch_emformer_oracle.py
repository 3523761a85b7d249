"""Torch-side oracle reproducing torchaudio ``Emformer`` semantics.

torchaudio is not installed in this image, so this is a minimal faithful
re-implementation of ``torchaudio.models.Emformer`` (the ``max_memory_size=0``
path the reference uses — `/root/reference/modules/Emformer/emformer.py:14-23`
leaves the memory bank at its disabled default) for use as a numerical oracle
in tests.  It mirrors torchaudio 2.x ``torchaudio/models/emformer.py``:

  * ``_EmformerAttention``: ``emb_to_query`` / ``emb_to_key_value`` /
    ``out_proj`` linears; queries scaled by ``head_dim**-0.5``; logits
    computed in float32, hard-set to ``negative_inf=-1e8`` where masked.
  * ``_EmformerLayer``: pre-attention LayerNorm over ``[right_context ∥
    utterance]``, residual from the *un-normalized* input, pre-LN FFN
    (``pos_ff`` = Sequential[LN, Linear, act, Dropout, Linear, Dropout]),
    final ``layer_norm_output``.
  * offline ``forward``: right-context hard-copy blocks
    (``_gen_right_context``), block-diagonal attention mask built from the
    col-widths logic (queries of segment *s* see their own rc block plus
    utterance positions ``[max(s*seg-L, 0), min((s+1)*seg, T))``), and a
    per-sample *padding* mask that marks utterance keys ``j >= lengths[b]``
    invalid while leaving every rc key valid (``_gen_padding_mask``:
    ``klengths = lengths + rc_blocks_len + lc_len``).
  * streaming ``infer``: per-layer state = [L]-row left-context K/V cache
    (right-aligned, ``past_length`` counter; ``_unpack_state`` slices the
    valid tail, ``_pack_state`` appends the chunk's utterance K/V rows and
    keeps the last L).

State-dict naming matches torchaudio exactly
(``emformer_layers.{i}.attention.emb_to_query.weight`` …) so the repo's
``conan_tpu.utils.torch_compat.emformer_from_torchaudio`` mapping is exercised
verbatim by the golden tests.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn

NEG_INF = -1e8


class _EmformerAttention(nn.Module):
    def __init__(self, input_dim: int, num_heads: int):
        super().__init__()
        self.input_dim = input_dim
        self.num_heads = num_heads
        self.scaling = (input_dim // num_heads) ** -0.5
        self.emb_to_key_value = nn.Linear(input_dim, 2 * input_dim, bias=True)
        self.emb_to_query = nn.Linear(input_dim, input_dim, bias=True)
        self.out_proj = nn.Linear(input_dim, input_dim, bias=True)

    def _attend(self, query, key, value, attention_mask, padding_mask):
        # query/key/value: [T, B, D] (time-first like torchaudio)
        Tq, B, D = query.shape
        Tk = key.shape[0]
        H, Dh = self.num_heads, D // self.num_heads
        q = query.contiguous().view(Tq, B * H, Dh).transpose(0, 1)
        k = key.contiguous().view(Tk, B * H, Dh).transpose(0, 1)
        v = value.contiguous().view(Tk, B * H, Dh).transpose(0, 1)
        w = torch.bmm(q * self.scaling, k.transpose(1, 2))  # [B*H, Tq, Tk]
        w = w.float()
        if attention_mask is not None:
            w = w.masked_fill(attention_mask.unsqueeze(0), NEG_INF)
        if padding_mask is not None:
            w = w.view(B, H, Tq, Tk).masked_fill(
                padding_mask.unsqueeze(1).unsqueeze(2).to(torch.bool), NEG_INF
            ).view(B * H, Tq, Tk)
        probs = torch.nn.functional.softmax(w, dim=-1).type_as(q)
        att = torch.bmm(probs, v).transpose(0, 1).contiguous().view(Tq, B, D)
        return self.out_proj(att)

    def forward(self, utterance, lengths, right_context, attention_mask):
        """Offline. Rows/keys = [right_context ∥ utterance]."""
        query = self.emb_to_query(torch.cat([right_context, utterance]))
        key, value = self.emb_to_key_value(
            torch.cat([right_context, utterance])).chunk(2, dim=2)
        B = utterance.size(1)
        if B == 1:
            padding_mask = None
        else:
            # torchaudio `_gen_padding_mask`: rc_blocks_length is computed as
            # T - max(lengths) (NOT right_context.size(0)) — every rc key is
            # valid, and utterance keys < lengths are valid.
            T = right_context.size(0) + utterance.size(0)
            rc_len = T - int(torch.max(lengths))
            klengths = lengths + rc_len
            Tk = key.size(0)
            padding_mask = (torch.arange(Tk, device=key.device)
                            .expand(B, Tk) >= klengths.unsqueeze(1))
        return self._attend(query, key, value, attention_mask, padding_mask)

    def infer(self, utterance, lengths, right_context, left_context_key,
              left_context_val):
        query = self.emb_to_query(torch.cat([right_context, utterance]))
        key, value = self.emb_to_key_value(
            torch.cat([right_context, utterance])).chunk(2, dim=2)
        rc_len = right_context.size(0) + utterance.size(0) - int(torch.max(lengths))
        key = torch.cat([key[:rc_len], left_context_key, key[rc_len:]])
        value = torch.cat([value[:rc_len], left_context_val, value[rc_len:]])
        B = utterance.size(1)
        if B == 1:
            padding_mask = None
        else:
            klengths = lengths + rc_len + left_context_key.size(0)
            Tk = key.size(0)
            padding_mask = (torch.arange(Tk, device=key.device)
                            .expand(B, Tk) >= klengths.unsqueeze(1))
        out = self._attend(query, key, value, None, padding_mask)
        lc = left_context_key.size(0)
        return out, key[rc_len + lc:], value[rc_len + lc:]


class _EmformerLayer(nn.Module):
    def __init__(self, input_dim: int, num_heads: int, ffn_dim: int,
                 segment_length: int, left_context_length: int):
        super().__init__()
        self.segment_length = segment_length
        self.left_context_length = left_context_length
        self.input_dim = input_dim
        self.attention = _EmformerAttention(input_dim, num_heads)
        self.pos_ff = nn.Sequential(
            nn.LayerNorm(input_dim),
            nn.Linear(input_dim, ffn_dim),
            nn.ReLU(),
            nn.Dropout(0.0),
            nn.Linear(ffn_dim, input_dim),
            nn.Dropout(0.0),
        )
        self.layer_norm_input = nn.LayerNorm(input_dim)
        self.layer_norm_output = nn.LayerNorm(input_dim)

    def _pre_ln(self, utterance, right_context):
        x = self.layer_norm_input(torch.cat([right_context, utterance]))
        return x[right_context.size(0):], x[:right_context.size(0)]

    def _post_ffn(self, rc_output, utterance, right_context):
        result = rc_output + torch.cat([right_context, utterance])
        result = self.pos_ff(result) + result
        result = self.layer_norm_output(result)
        return result[right_context.size(0):], result[:right_context.size(0)]

    def forward(self, utterance, lengths, right_context, attention_mask):
        ln_utt, ln_rc = self._pre_ln(utterance, right_context)
        rc_output = self.attention(ln_utt, lengths, ln_rc, attention_mask)
        return self._post_ffn(rc_output, utterance, right_context)

    def _init_state(self, batch_size, device):
        L, D = self.left_context_length, self.input_dim
        return [
            torch.zeros(L, batch_size, D, device=device),
            torch.zeros(L, batch_size, D, device=device),
            torch.zeros(1, batch_size, dtype=torch.int32, device=device),
        ]

    def _unpack_state(self, state):
        past_length = int(state[2][0][0])
        lc = min(self.left_context_length, past_length)
        return state[0][self.left_context_length - lc:], \
            state[1][self.left_context_length - lc:]

    def _pack_state(self, next_k, next_v, update_length, state):
        new_k = torch.cat([state[0], next_k])
        new_v = torch.cat([state[1], next_v])
        L = self.left_context_length
        return [new_k[new_k.size(0) - L:], new_v[new_v.size(0) - L:],
                state[2] + update_length]

    def infer(self, utterance, lengths, right_context, state):
        ln_utt, ln_rc = self._pre_ln(utterance, right_context)
        if state is None:
            state = self._init_state(utterance.size(1), utterance.device)
        lc_key, lc_val = self._unpack_state(state)
        rc_output, next_k, next_v = self.attention.infer(
            ln_utt, lengths, ln_rc, lc_key, lc_val)
        state = self._pack_state(next_k, next_v, utterance.size(0), state)
        out_utt, out_rc = self._post_ffn(rc_output, utterance, right_context)
        return out_utt, out_rc, state


def _gen_attention_mask_block(col_widths, col_mask, num_rows):
    blocks = [torch.ones(num_rows, w) if m else torch.zeros(num_rows, w)
              for w, m in zip(col_widths, col_mask)]
    return torch.cat(blocks, dim=1)


class TorchEmformer(nn.Module):
    """Oracle mirror of ``torchaudio.models.Emformer`` (memory disabled)."""

    def __init__(self, input_dim: int, num_heads: int, ffn_dim: int,
                 num_layers: int, segment_length: int,
                 left_context_length: int = 0, right_context_length: int = 0):
        super().__init__()
        self.segment_length = segment_length
        self.left_context_length = left_context_length
        self.right_context_length = right_context_length
        self.emformer_layers = nn.ModuleList([
            _EmformerLayer(input_dim, num_heads, ffn_dim, segment_length,
                           left_context_length)
            for _ in range(num_layers)
        ])

    def _gen_right_context(self, input):
        # input: [T, B, D]; block s = input[(s+1)*seg : +rc], last block =
        # the final rc frames (same thing when T-rc is segment-aligned).
        T = input.size(0)
        rc, seg = self.right_context_length, self.segment_length
        num_segs = math.ceil((T - rc) / seg)
        blocks = []
        for s in range(num_segs - 1):
            start = (s + 1) * seg
            blocks.append(input[start:start + rc])
        blocks.append(input[T - rc:])
        return torch.cat(blocks)

    def _gen_attention_mask_col_widths(self, seg_idx, utterance_length):
        num_segs = math.ceil(utterance_length / self.segment_length)
        rc = self.right_context_length
        lc = self.left_context_length
        rc_start = seg_idx * rc
        rc_end = rc_start + rc
        seg_start = max(seg_idx * self.segment_length - lc, 0)
        seg_end = min((seg_idx + 1) * self.segment_length, utterance_length)
        rc_length = rc * num_segs
        return [
            rc_start,                    # before right context
            rc,                          # right context block
            rc_length - rc_end,          # after right context
            seg_start,                   # before query segment (+left ctx)
            seg_end - seg_start,         # query segment window
            utterance_length - seg_end,  # after query segment
        ]

    def _gen_attention_mask(self, utterance):
        T = utterance.size(0)
        num_segs = math.ceil(T / self.segment_length)
        rc_mask, query_mask = [], []
        col_mask = [False, True, False, True, True, False]
        # col groups 1 (own rc block) and 3+4 … torchaudio marks [1, 4]; group
        # 3 is the "before query segment" remainder which excludes left
        # context by construction (seg_start already subtracts lc), so only
        # [1, 4] are attendable.
        col_mask = [i in (1, 4) for i in range(6)]
        for s in range(num_segs):
            w = self._gen_attention_mask_col_widths(s, T)
            rc_mask.append(_gen_attention_mask_block(
                w, col_mask, self.right_context_length))
            query_mask.append(_gen_attention_mask_block(
                w, col_mask, min(self.segment_length, T - s * self.segment_length)))
        mask = 1 - torch.cat([torch.cat(rc_mask), torch.cat(query_mask)])
        return mask.to(torch.bool)

    @torch.no_grad()
    def forward(self, input, lengths):
        """input [B, T_utt + rc, D]; lengths = per-sample valid *utterance*
        frames (torchaudio masks utterance keys ``>= lengths``; rc keys stay
        valid).  Returns ([B, T_utt, D], lengths)."""
        input = input.permute(1, 0, 2)
        right_context = self._gen_right_context(input)
        utterance = input[:input.size(0) - self.right_context_length]
        attention_mask = self._gen_attention_mask(utterance)
        output = utterance
        for layer in self.emformer_layers:
            output, right_context = layer(output, lengths, right_context,
                                          attention_mask)
        return output.permute(1, 0, 2), lengths

    @torch.no_grad()
    def infer(self, input, lengths, states=None):
        """input [B, seg + rc, D]; lengths includes the rc tail (reference
        passes ``chunk.size(1)`` — emformer.py:87)."""
        input = input.permute(1, 0, 2)
        rc_start = input.size(0) - self.right_context_length
        right_context = input[rc_start:]
        utterance = input[:rc_start]
        output_lengths = torch.clamp(lengths - self.right_context_length, min=0)
        output = utterance
        out_states = []
        for i, layer in enumerate(self.emformer_layers):
            output, right_context, st = layer.infer(
                output, output_lengths, right_context,
                None if states is None else states[i])
            out_states.append(st)
        return output.permute(1, 0, 2), output_lengths, out_states


class TorchEmformerDistillModel(nn.Module):
    """Reference wrapper (`/root/reference/modules/Emformer/emformer.py:6-47`):
    ``emformer`` + ``proj`` head (or ``proj1``/``proj2`` when mode='both'),
    streaming ``inference`` loop with repeat-last-frame tail padding."""

    def __init__(self, num_layers=2, input_dim=16, num_heads=4, ffn_dim=32,
                 segment_length=4, left_context_length=6,
                 right_context_length=2, output_dim=100, mode=None):
        super().__init__()
        self.emformer = TorchEmformer(
            input_dim, num_heads, ffn_dim, num_layers, segment_length,
            left_context_length, right_context_length)
        self.segment_length = segment_length
        self.right_context_len = right_context_length
        self.mode = mode
        if mode == "both":
            self.proj1 = nn.Linear(input_dim, 100)
            self.proj2 = nn.Linear(input_dim, 768)
        else:
            self.proj = nn.Linear(input_dim, output_dim)

    @torch.no_grad()
    def forward(self, mel_input, lengths):
        output, lengths = self.emformer(mel_input, lengths)
        if self.mode == "both":
            return self.proj1(output), self.proj2(output), lengths
        return self.proj(output), lengths

    @torch.no_grad()
    def inference(self, mel_input):
        """Streaming loop with repeat-pad tail (reference emformer.py:48-98)."""
        B, T, F = mel_input.shape
        seg, rc = self.segment_length, self.right_context_len
        pos, state, out_chunks = 0, None, []
        while pos < T:
            emit = min(seg, T - pos)
            look = min(rc, T - (pos + emit))
            chunk = mel_input[:, pos:pos + emit + look, :]
            need = (seg + rc) - (emit + look)
            if need > 0:
                pad = chunk[:, -1:, :].expand(B, need, F)
                chunk = torch.cat([chunk, pad], dim=1)
            lengths = torch.full((B,), chunk.size(1), dtype=torch.long)
            out, _, state = self.emformer.infer(chunk, lengths, state)
            out_chunks.append(out[:, :emit, :])
            pos += emit
        streamed = torch.cat(out_chunks, dim=1)
        if self.mode == "both":
            return self.proj1(streamed), self.proj2(streamed)
        return self.proj(streamed)
