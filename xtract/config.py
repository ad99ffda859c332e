"""ExtractionConfig — the replayable engine recipe.

Reference analogue: ``TesseractConfiguration { datapath, language,
variables }`` (reference ``src/api.rs:12-17``) replayed onto fresh
engines by ``try_clone()`` (``src/api.rs:1423-1446``).  Ours is a frozen
dataclass serialized into actor constructors: replicate *config*, not
state.  Variable get/set with a registry of known keys mirrors
``set_variable`` validation (``src/api.rs:132-153``; unknown-key error
tested at reference ``tests/integration_test.rs:244-246``).

All thresholds are integers or rationals (numerator/denominator pairs)
so classification decisions never depend on float rounding — a
requirement for byte-identical output under parallelism (SURVEY §4.3).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any

from .langdetect import LANGS as _ALL_LANGS


class ConfigError(ValueError):
    """Unknown or ill-typed configuration key (src/error.rs:6-41 analogue)."""


#: Segmentation modes — the PSM analogue (reference ``src/enums.rs:4-20``,
#: ``set_page_seg_mode`` ``src/api.rs:259-280``).
SEG_MODES = ("auto", "article", "single_block", "lines", "sparse", "raw")

#: Registry of user-settable variables (the ``set_variable`` surface).
#: name -> (type, default).  Unknown names raise ConfigError.
VARIABLE_REGISTRY: dict[str, tuple[type, Any]] = {
    "char_whitelist": (str, ""),
    "char_blacklist": (str, ""),
    "min_block_chars": (int, 10),
    "max_link_density_num": (int, 1),   # drop block if link_chars*den > chars*num
    "max_link_density_den": (int, 3),
    "min_text_density": (int, 0),
    "seg_mode": (str, "auto"),
    "timeout_ms": (int, 0),             # 0 = no per-row deadline
    "lang_conf_margin": (int, 2),       # min integer score for a lang call, else 'und'
    "keep_headings": (bool, True),
    "keep_lists": (bool, True),
    "keep_tables": (bool, True),
    "keep_captions": (bool, True),
    "debug": (bool, False),
    "keep_input": (bool, False),        # raw-input passthrough (set/get_input_image analogue, src/api.rs:675-697)
    "scope_prefix": (str, ""),          # tag-path prefix filter (set_rectangle analogue, src/api.rs:1289-1296)
    "segment_only": (bool, False),      # analyse_layout analogue (src/api.rs:1353-1364)
    "assets_dir": (str, ""),            # extra language tables (datapath analogue, src/api.rs:71-97)
    "pre_clean": (str, ""),             # registered preprocessing hook name (preprocess_image analogue, tests/common/mod.rs:44-51)
}

#: Registry of named preprocessing hooks (bytes → bytes, MUST be
#: deterministic — the hook NAME is part of the config json, so it is
#: hashed into lineage manifests; the function itself must be
#: registered identically on every worker, which module-level
#: registration guarantees).
PRE_CLEAN_REGISTRY: dict[str, Any] = {}


def register_pre_clean(name: str, fn) -> None:
    """Register a deterministic bytes→bytes preprocessing hook under
    ``name`` (the caller-side ``preprocess_image`` analogue).  Select it
    with ``ExtractionConfig(pre_clean=name)``."""
    if not name:
        raise ConfigError("pre_clean hook needs a non-empty name")
    PRE_CLEAN_REGISTRY[name] = fn


def resolve_pre_clean(name: str):
    if not name:
        return None
    fn = PRE_CLEAN_REGISTRY.get(name)
    if fn is None:
        raise ConfigError(
            f"pre_clean hook {name!r} is not registered "
            f"(known: {sorted(PRE_CLEAN_REGISTRY)})")
    return fn


@dataclass(frozen=True)
class ExtractionConfig:
    """Frozen recipe for one extraction engine worker."""

    #: language restriction (init(language) analogue): detection only
    #: considers these codes.  Default = every built-in table, so the
    #: unrestricted engine detects across all known languages.
    langs: tuple[str, ...] = _ALL_LANGS
    char_whitelist: str = ""
    char_blacklist: str = ""
    min_block_chars: int = 10
    max_link_density_num: int = 1
    max_link_density_den: int = 3
    min_text_density: int = 0
    seg_mode: str = "auto"
    timeout_ms: int = 0
    lang_conf_margin: int = 2
    keep_headings: bool = True
    keep_lists: bool = True
    keep_tables: bool = True
    keep_captions: bool = True
    debug: bool = False
    #: carry the raw input payload through to the output as
    #: ``input_bytes`` (the set_input_image/get_input_image round-trip
    #: analogue, reference src/api.rs:675-697): the engine keeps the
    #: document it was given and hands it back byte-identical; rows
    #: with no input (null html) round-trip as null — the per-row
    #: NullPointerError analogue (error.rs surface → status column).
    keep_input: bool = False
    scope_prefix: str = ""
    segment_only: bool = False
    assets_dir: str = ""
    pre_clean: str = ""

    def __post_init__(self) -> None:
        if self.seg_mode not in SEG_MODES:
            raise ConfigError(f"unknown seg_mode {self.seg_mode!r}; want one of {SEG_MODES}")
        if self.max_link_density_den <= 0:
            raise ConfigError("max_link_density_den must be > 0")
        if self.min_block_chars < 0 or self.timeout_ms < 0:
            raise ConfigError("negative thresholds not allowed")

    # -- set_variable / get_*_variable analogues ------------------------------
    def with_variable(self, name: str, value: Any) -> "ExtractionConfig":
        """Return a new config with one variable changed (configs are frozen
        before launch — no mid-run mutation, mirroring config replay)."""
        if name == "langs":
            if isinstance(value, str):  # CLI form: --set langs=en,tr
                value = [v for v in value.split(",") if v]
            return dataclasses.replace(self, langs=tuple(value))
        if name not in VARIABLE_REGISTRY:
            raise ConfigError(f"unknown variable {name!r}")
        typ, _ = VARIABLE_REGISTRY[name]
        if typ is bool and isinstance(value, str):
            value = value.lower() in ("1", "true", "yes", "on")
        try:
            value = typ(value)
        except (TypeError, ValueError) as exc:
            raise ConfigError(f"variable {name!r} expects {typ.__name__}: {exc}") from exc
        return dataclasses.replace(self, **{name: value})

    def get_variable(self, name: str) -> Any:
        if name == "langs":
            return self.langs
        if name not in VARIABLE_REGISTRY:
            raise ConfigError(f"unknown variable {name!r}")
        return getattr(self, name)

    # -- config-file surface (read_config_file analogue, src/api.rs:791-818) --
    def to_json(self) -> str:
        d = dataclasses.asdict(self)
        d["langs"] = list(self.langs)
        return json.dumps(d, sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "ExtractionConfig":
        d = json.loads(s)
        d["langs"] = tuple(d.get("langs", _ALL_LANGS))
        known = {f.name for f in dataclasses.fields(cls)}
        unknown = set(d) - known
        if unknown:
            raise ConfigError(f"unknown config keys: {sorted(unknown)}")
        return cls(**d)

    def config_hash(self) -> str:
        """Stable hash recorded in lineage manifests (reproducibility)."""
        import hashlib

        return hashlib.sha256(self.to_json().encode()).hexdigest()[:16]

    def describe(self) -> dict[str, Any]:
        """pipeline_describe() — typed config introspection (src/api.rs:164-248)."""
        d = dataclasses.asdict(self)
        d["langs"] = list(self.langs)
        d["config_hash"] = self.config_hash()
        return d


DEFAULT_CONFIG = ExtractionConfig()
