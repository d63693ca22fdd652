"""Engine configuration: mode presets, prompts, env knobs.

Replaces the reference's scattered env parsing (docker/start_server.py:
302-391), config module (docker/overrides/config.py) and YAML prompt
loader (Lib/file_utils.py:164-190) with one typed config surface.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Optional

from .functions.tiling import PRESETS, TilingPreset

#: Default prompt (docker/overrides/config.py:33).
DEFAULT_PROMPT = "<image>\n<|grounding|>Convert the document to markdown."

#: Mode presets (pdf_to_markdown_cli.py:40-43): mode -> (prompt, cleanup?).
#: ``custom`` means caller-supplied prompt and RAW output (no cleaning,
#: pdf_to_markdown_cli.py:354-360).
MODE_PROMPTS = {
    "markdown": DEFAULT_PROMPT,
    "ocr": "<image>\nFree OCR.",
    "custom": None,
}


def effective_dpi(env_value: Optional[str] = None, default: int = 144) -> int:
    """PDF raster DPI with the reference's clamp semantics
    (docker/start_server.py:385-391): env PDF_DPI used only if
    0 < value <= 300 and parseable; otherwise the default."""
    if env_value is None:
        env_value = os.environ.get("PDF_DPI", "")
    env_value = env_value.strip()
    try:
        if env_value:
            v = int(env_value)
            if 0 < v <= 300:
                return v
    except Exception:
        pass
    return default


def raster_zoom(dpi: int) -> float:
    """PyMuPDF zoom factor ``dpi/72`` (docker/start_server.py:398)."""
    return dpi / 72.0


def max_pages(env_value: Optional[str] = None) -> int:
    """MAX_PAGES env semantics (docker/start_server.py:444-450):
    int(env) if parseable else 0; 0 = unlimited."""
    if env_value is None:
        env_value = os.environ.get("MAX_PAGES", "")
    env_value = env_value.strip()
    try:
        return int(env_value) if env_value else 0
    except Exception:
        return 0


def load_prompt_config(path: str) -> Optional[str]:
    """YAML custom-prompt loader (Lib/file_utils.py:164-190): file must
    parse to a mapping with a non-empty string ``prompt`` key; anything
    else -> None (the reference logs and returns None)."""
    try:
        import yaml

        with open(path, "r", encoding="utf-8") as f:
            data = yaml.safe_load(f)
        if isinstance(data, dict):
            prompt = data.get("prompt")
            if isinstance(prompt, str) and prompt.strip():
                return prompt
        return None
    except Exception:
        return None


@dataclass
class EngineConfig:
    """One run's knobs (SURVEY.md section 2.11)."""

    mode: str = "markdown"
    prompt: Optional[str] = None          # custom prompt (mode="custom")
    extract_images: bool = False          # M6 link rewrite vs removal
    remove_page_splits: bool = True       # M4
    raw_output: bool = False              # --no-clean
    max_pages: int = 0                    # O1; 0 = unlimited
    skip_repeat: bool = False             # O4 (batch-script path)
    dpi: int = 144                        # S2
    tiling: TilingPreset = field(default_factory=lambda: PRESETS["gundam"])
    backend: str = "mock"
    model_path: str = "deepseek-ai/DeepSeek-OCR"

    def resolved_prompt(self) -> str:
        if self.mode == "custom":
            return self.prompt or DEFAULT_PROMPT
        return MODE_PROMPTS[self.mode] or DEFAULT_PROMPT
