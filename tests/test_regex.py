"""Go replacement-syntax translation (SURVEY.md §7 hard-part 1)."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from asserts_otel_processor_ray.functions.regex import (
    ReplacementTranslationError,
    go_replacement_to_re2,
)


def test_numeric_groups():
    assert go_replacement_to_re2("$1") == "\\1"
    assert go_replacement_to_re2("${1}") == "\\1"
    assert go_replacement_to_re2("$1 $2") == "\\1 \\2"
    # Go longest-name rule: $1b is the (absent) group named "1b" → ""
    assert go_replacement_to_re2("a$1b") == "a"
    assert go_replacement_to_re2("a${1}b") == "a\\1b"


def test_literal_dollar():
    assert go_replacement_to_re2("$$1") == "$1"
    assert go_replacement_to_re2("100$$") == "100$"


def test_plain_text():
    assert go_replacement_to_re2("client_errors") == "client_errors"


def test_named_group_expands_empty():
    # no named groups exist in our rule configs; Go expands an absent
    # named group to "" (regexp.Expand)
    assert go_replacement_to_re2("${name}") == ""
    assert go_replacement_to_re2("x${name}y") == "xy"


def test_group_over_nine_rejected():
    with pytest.raises(ReplacementTranslationError):
        go_replacement_to_re2("$10")


def test_re2_semantics_replace_all_preserves_unmatched():
    # Go ReplaceAllString replaces every non-overlapping match and keeps
    # surrounding text (custom_attribute.go:92-94); Arrow's RE2
    # replace_substring_regex must agree.
    arr = pa.array(["x=1 y=2 z=3"])
    out = pc.replace_substring_regex(
        arr, r"(\w)=(\d)", go_replacement_to_re2("$2"))
    assert out.to_pylist() == ["1 2 3"]


def test_re2_group_extraction_golden():
    # golden: 2- vs 3-segment rules (span_enrichment_test.go:165-179)
    url = pa.array(["https://some.domain.com/foo/bar/baz?a=b"])
    two = pc.replace_substring_regex(
        url, r"https?://.+?((/[^/?]+){1,2}).*", "\\1")
    three = pc.replace_substring_regex(
        url, r"https?://.+?((/[^/?]+){1,3}).*", "\\1")
    assert two.to_pylist() == ["/foo/bar"]
    assert three.to_pylist() == ["/foo/bar/baz"]
