"""MLM masking collators, numpy host-side.

Behavioural spec: HF `DataCollatorForLanguageModeling` and
`DataCollatorForWholeWordMask`, selected by `whole_word_masking`
(reference vilt/datamodules/datamodule_base.py:57-65).

Semantics (HF parity):
  * each non-special token is masked with prob `mlm_prob` (0.15);
  * of masked tokens: 80% -> [MASK], 10% -> random vocab id, 10% kept;
  * labels = original id at masked positions, -100 elsewhere.
Whole-word masking groups "##" continuation pieces with their head word
and masks whole words until ~mlm_prob of tokens are covered.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


class MLMCollator:
    def __init__(self, tokenizer, mlm_prob: float = 0.15,
                 whole_word: bool = False, seed: int = None):
        self.tok = tokenizer
        self.mlm_prob = mlm_prob
        self.whole_word = whole_word
        self.rng = np.random.RandomState(seed)
        self.mask_id = int(tokenizer.mask_token_id
                           if hasattr(tokenizer, "mask_token_id")
                           else tokenizer.convert_tokens_to_ids("[MASK]"))
        self.vocab_size = int(getattr(tokenizer, "vocab_size", 30522))

    # ------------------------------------------------------------------
    def __call__(self, input_ids: np.ndarray,
                 special_tokens_mask: np.ndarray
                 ) -> Tuple[np.ndarray, np.ndarray]:
        """(ids (B, T), special (B, T)) -> (mlm_ids, mlm_labels)."""
        ids = np.array(input_ids, np.int32, copy=True)
        special = np.asarray(special_tokens_mask).astype(bool)

        if self.whole_word:
            masked = self._whole_word_mask(ids, special)
        else:
            prob = np.full(ids.shape, self.mlm_prob)
            prob[special] = 0.0
            masked = self.rng.random_sample(ids.shape) < prob

        labels = np.where(masked, ids, -100).astype(np.int32)

        replace = masked & (self.rng.random_sample(ids.shape) < 0.8)
        ids[replace] = self.mask_id
        randomize = (masked & ~replace
                     & (self.rng.random_sample(ids.shape) < 0.5))
        ids[randomize] = self.rng.randint(
            0, self.vocab_size, int(randomize.sum()))
        return ids, labels

    # ------------------------------------------------------------------
    def _word_groups(self, row_ids: np.ndarray,
                     special_row: np.ndarray) -> List[List[int]]:
        toks = self.tok.convert_ids_to_tokens(
            [int(i) for i in row_ids])
        groups: List[List[int]] = []
        for pos, (t, sp) in enumerate(zip(toks, special_row)):
            if sp:
                continue
            if t.startswith("##") and groups:
                groups[-1].append(pos)
            else:
                groups.append([pos])
        return groups

    def _whole_word_mask(self, ids: np.ndarray,
                         special: np.ndarray) -> np.ndarray:
        masked = np.zeros(ids.shape, bool)
        for b in range(ids.shape[0]):
            groups = self._word_groups(ids[b], special[b])
            n_tokens = int((~special[b]).sum())
            budget = max(1, int(round(n_tokens * self.mlm_prob)))
            order = self.rng.permutation(len(groups))
            covered = 0
            for gi in order:
                g = groups[gi]
                if covered + len(g) > budget and covered > 0:
                    continue
                for pos in g:
                    masked[b, pos] = True
                covered += len(g)
                if covered >= budget:
                    break
        return masked
