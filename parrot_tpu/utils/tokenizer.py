"""Dual-backend tokenizer (host-side, mirrors ``lit_gpt/tokenizer.py``).

Backends, in the reference's precedence order (``tokenizer.py:9-29``):
``tokenizer.model`` (sentencepiece) takes priority over ``tokenizer.json``
(HF tokenizers). Both are host libraries — tokenization never touches the
device, same as the reference treats them.

sentencepiece is an optional dependency: if only a ``tokenizer.model`` is
present and the library is missing, a clear ImportError tells the user what
to install.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np


class Tokenizer:
    def __init__(self, checkpoint_dir: Path) -> None:
        checkpoint_dir = Path(checkpoint_dir)
        self.backend: str
        self.bos_id: Optional[int] = None
        self.eos_id: Optional[int] = None

        if (sp_file := checkpoint_dir / "tokenizer.model").is_file():
            try:
                from sentencepiece import SentencePieceProcessor
            except ImportError as e:
                if (checkpoint_dir / "tokenizer.json").is_file():
                    self._init_hf(checkpoint_dir)
                    return
                raise ImportError(
                    f"{sp_file} requires the `sentencepiece` package (pip install sentencepiece)"
                ) from e
            self.backend = "sentencepiece"
            self.processor = SentencePieceProcessor(model_file=str(sp_file))
            self.bos_id = self.processor.bos_id()
            self.eos_id = self.processor.eos_id()
        elif (checkpoint_dir / "tokenizer.json").is_file():
            self._init_hf(checkpoint_dir)
        else:
            raise NotImplementedError(
                f"No tokenizer.model or tokenizer.json in {checkpoint_dir}"
            )

    def _init_hf(self, checkpoint_dir: Path) -> None:
        import json

        from tokenizers import Tokenizer as HFTokenizer

        self.backend = "huggingface"
        self.processor = HFTokenizer.from_file(str(checkpoint_dir / "tokenizer.json"))
        config_path = checkpoint_dir / "tokenizer_config.json"
        if config_path.is_file():
            with open(config_path) as f:
                config = json.load(f)
            if (bos := config.get("bos_token")) is not None:
                tok = bos["content"] if isinstance(bos, dict) else bos
                self.bos_id = self.processor.token_to_id(tok)
            if (eos := config.get("eos_token")) is not None:
                tok = eos["content"] if isinstance(eos, dict) else eos
                self.eos_id = self.processor.token_to_id(tok)

    @property
    def vocab_size(self) -> int:
        if self.backend == "sentencepiece":
            return self.processor.vocab_size()
        return self.processor.get_vocab_size(with_added_tokens=False)

    def encode(
        self,
        string: str,
        bos: bool = False,
        eos: bool = False,
        max_length: int = -1,
    ) -> np.ndarray:
        if self.backend == "sentencepiece":
            tokens = self.processor.encode(string)
        else:
            tokens = self.processor.encode(string).ids
        if bos:
            if self.bos_id is None or self.bos_id < 0:
                raise NotImplementedError("This tokenizer does not define a BOS token")
            tokens = [self.bos_id] + tokens
        if eos:
            if self.eos_id is None or self.eos_id < 0:
                raise NotImplementedError("This tokenizer does not define an EOS token")
            tokens = tokens + [self.eos_id]
        if max_length > 0:
            tokens = tokens[:max_length]
        return np.asarray(tokens, dtype=np.int32)

    def token_to_id(self, token: str) -> int:
        if self.backend == "sentencepiece":
            tid = self.processor.piece_to_id(token)
        else:
            tid = self.processor.token_to_id(token)
        if tid is None:
            raise ValueError(f"token {token!r} not found in the tokenizer vocabulary")
        return tid

    def decode(self, tokens) -> str:
        tokens = np.asarray(tokens).tolist()
        if isinstance(tokens, int):
            tokens = [tokens]
        return self.processor.decode(tokens)
