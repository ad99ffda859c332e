"""Config surface: variable registry, typed get/set, JSON round-trip
(mirrors reference set_variable validation, tests/integration_test.rs:244-246)."""

import pytest

from xtract.config import DEFAULT_CONFIG, ConfigError, ExtractionConfig


def test_unknown_variable_rejected():
    with pytest.raises(ConfigError):
        DEFAULT_CONFIG.with_variable("no_such_variable", 1)


def test_variable_roundtrip():
    cfg = DEFAULT_CONFIG.with_variable("min_block_chars", 25)
    assert cfg.get_variable("min_block_chars") == 25
    assert DEFAULT_CONFIG.min_block_chars == 10  # frozen original untouched


def test_bool_coercion_from_string():
    cfg = DEFAULT_CONFIG.with_variable("debug", "true")
    assert cfg.debug is True


def test_bad_type_rejected():
    with pytest.raises(ConfigError):
        DEFAULT_CONFIG.with_variable("min_block_chars", "not-an-int")


def test_json_roundtrip():
    cfg = ExtractionConfig(char_whitelist="0123456789", seg_mode="raw")
    back = ExtractionConfig.from_json(cfg.to_json())
    assert back == cfg
    assert back.config_hash() == cfg.config_hash()


def test_json_unknown_key_rejected():
    with pytest.raises(ConfigError):
        ExtractionConfig.from_json('{"bogus_key": 1}')


def test_invalid_seg_mode():
    with pytest.raises(ConfigError):
        ExtractionConfig(seg_mode="psm99")


def test_describe_contains_hash():
    d = DEFAULT_CONFIG.describe()
    assert "config_hash" in d and d["seg_mode"] == "auto"


def test_pre_clean_hook_applies():
    from xtract.config import (ConfigError, ExtractionConfig,
                               register_pre_clean)
    from xtract.extract import extract_document

    register_pre_clean("strip_marquee",
                       lambda b: b.replace(b"junkword", b"cleanword"))
    html = (b"<html><body>"
            b"<p>the actual junkword body text of the page</p></body></html>")
    plain = extract_document(html, None, None, ExtractionConfig())
    assert "junkword" in plain["content_text"]
    cleaned = extract_document(
        html, None, None, ExtractionConfig(pre_clean="strip_marquee"))
    assert "junkword" not in cleaned["content_text"]
    assert "cleanword" in cleaned["content_text"]
    # hook name is part of the replayable config (manifest-hashable)
    cfg = ExtractionConfig(pre_clean="strip_marquee")
    assert cfg.config_hash() != ExtractionConfig().config_hash()
    assert ExtractionConfig.from_json(cfg.to_json()).pre_clean == "strip_marquee"
    # unregistered hook fails loudly at use
    import pytest as _pytest
    with _pytest.raises(ConfigError):
        extract_document(html, None, None,
                         ExtractionConfig(pre_clean="nope"))
