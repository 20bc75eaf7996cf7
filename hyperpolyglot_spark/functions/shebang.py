"""Shebang-line interpreter detection — semantics re-expressed from
reference src/detectors/interpreters.rs:8-65 (tests :67-158).

Rules:
  - only the FIRST line, and only if it starts with "#!" (a leading
    space disqualifies);
  - take the last '/'-segment, then the first whitespace token of it;
  - "env X"  -> X;   bare "env" -> nothing;
  - "sh"     -> scan the next 4 lines for the exec hack
                ``exec (\\w+).+\\$0.+\\$@`` -> captured interpreter,
                else "sh";
  - strip from the first digit-dot-digit match on: "python2.6" ->
    "python" (Regex::split keeps the part before the first match);
  - probe the interpreter dim map (1:N).

Spark-side this is a handful of string/regexp built-ins; the pure
function here is the spec + what rides inside batch UDFs. The web-text
pipeline's analog is the <html lang> tag (metadata.meta_lang_candidates);
this literal operator exists for reference parity and for code-like
corpora.
"""

from __future__ import annotations

import re

# interpreter -> candidate languages (1:N), the INTERPRETERS map analog
# (compiled from languages.yml by reference codegen.rs:258-288; this is
# a representative slice, extensible the same way).
INTERPRETER_LANGS: dict[str, tuple[str, ...]] = {
    "python": ("Python",),
    "python2": ("Python",),
    "python3": ("Python",),
    "node": ("JavaScript",),
    "nodejs": ("JavaScript",),
    "deno": ("TypeScript",),
    "sh": ("Shell",),
    "bash": ("Shell",),
    "zsh": ("Shell",),
    "dash": ("Shell",),
    "ruby": ("Ruby",),
    "perl": ("Perl", "Raku"),
    "php": ("PHP",),
    "Rscript": ("R",),
    "scala": ("Scala",),
    "lua": ("Lua",),
    "tclsh": ("Tcl",),
    "awk": ("Awk",),
    "gawk": ("Awk",),
    "parrot": ("Parrot Assembly", "Parrot Internal Representation"),
    "julia": ("Julia",),
    "elixir": ("Elixir",),
    "escript": ("Erlang",),
    "fish": ("fish",),
    "pwsh": ("PowerShell",),
    "groovy": ("Groovy",),
}

_EXEC_HACK_RE = re.compile(r"exec (\w+).+\$0.+\$@")
_VERSION_RE = re.compile(r"[0-9]\.[0-9]")


def parse_shebang_interpreter(content: str) -> str | None:
    """First-line shebang -> interpreter token (pre-dim-probe)."""
    lines = content.split("\n")
    first = lines[0] if lines else ""
    if not first.startswith("#!"):
        return None
    segment = first.split("/")[-1]
    tokens = segment.split()
    if not tokens:
        return None
    head = tokens[0]
    if head == "env":
        if len(tokens) < 2:
            return None
        interpreter = tokens[1]
    elif head == "sh":
        extra = "\n".join(lines[1:5])
        m = _EXEC_HACK_RE.search(extra)
        interpreter = m.group(1) if m else "sh"
    else:
        interpreter = head
    # strip at the first digit-dot-digit (interpreters.rs:52-58)
    return _VERSION_RE.split(interpreter)[0]


def get_languages_from_shebang(content: str) -> list[str]:
    interp = parse_shebang_interpreter(content)
    if interp is None:
        return []
    return list(INTERPRETER_LANGS.get(interp, ()))
