"""Regex plumbing: Go `regexp` → Arrow/RE2 rewrite translation.

The reference engine is Go's ``regexp`` (RE2 syntax) and applies rules with
``FindStringSubmatch`` as the match gate and ``ReplaceAllString`` for the
value (assertsprocessor/custom_attribute.go:92-94).  pyarrow.compute's
``match_substring_regex`` / ``replace_substring_regex`` are also RE2, so
patterns transfer verbatim; only the *replacement* syntax differs:

* Go: ``$1``, ``${1}``, ``$name``, ``$$`` (literal dollar)
* RE2 rewrite (Arrow / DuckDB): ``\\1`` … ``\\9``, ``\\\\`` (literal backslash)

Named-group references in replacements are not used by the reference's
sample configs and are rejected here (numbered groups cover RE2 fully).
"""

from __future__ import annotations

import re

# Go replacement tokens: $$, ${name_or_num}, $name_or_num (longest run of
# word chars, per Go's regexp.Expand which consumes letters/digits/_).
_GO_TOKEN = re.compile(r"\$(\$|\{([A-Za-z0-9_]+)\}|([A-Za-z0-9_]+))")


class ReplacementTranslationError(ValueError):
    pass


def go_replacement_to_re2(replacement: str) -> str:
    """Translate a Go ``ReplaceAllString`` replacement to an RE2 rewrite.

    ``$1`` → ``\\1``; ``$$`` → ``$``; backslashes are escaped for RE2.
    Raises on named-group references (``${name}``) which RE2 rewrites
    cannot express.
    """
    out: list[str] = []
    pos = 0
    for m in _GO_TOKEN.finditer(replacement):
        out.append(replacement[pos:m.start()].replace("\\", "\\\\"))
        pos = m.end()
        if m.group(1) == "$":
            out.append("$")
            continue
        name = m.group(2) if m.group(2) is not None else m.group(3)
        if name.isdigit():
            n = int(name)
            if n > 9:
                raise ReplacementTranslationError(
                    f"RE2 rewrites support \\0-\\9 only, got ${name}")
            out.append("\\" + str(n))
        else:
            # Go treats $1b / ${name} as a *named* group reference
            # (longest-name rule, regexp.Expand docs) and expands it to
            # "" when the pattern defines no such group — the only case
            # expressible in RE2 rewrites, so that is what we emit.
            pass
    out.append(replacement[pos:].replace("\\", "\\\\"))
    return "".join(out)


def validate_re2_pattern(pattern: str) -> None:
    """Best-effort validation that `pattern` compiles.

    Python's ``re`` accepts a superset of RE2 except for RE2-only syntax;
    the reference validates with Go's regexp.Compile
    (assertsprocessor/custom_attribute.go:43-51).  A pattern that fails
    Python ``re`` *and* would fail RE2 is rejected here; Arrow raises at
    execution time for the rare RE2-specific rejects (backrefs etc.).
    """
    try:
        re.compile(pattern)
    except re.error as exc:
        raise ValueError(f"invalid regex {pattern!r}: {exc}") from exc
