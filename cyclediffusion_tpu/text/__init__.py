"""Host-side text tokenization for conditioning and CLIP scoring."""

from cyclediffusion_tpu.text.tokenizer import (  # noqa: F401
    BertWordPieceTokenizer,
    CLIPBPETokenizer,
    HashTokenizer,
)
