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
# (compiled from languages.yml by reference codegen.rs:258-288; entries
# drawn from the public github-linguist interpreter lists, extensible
# the same way).
INTERPRETER_LANGS: dict[str, tuple[str, ...]] = {
    # Python family
    "python": ("Python",),
    "python2": ("Python",),
    "python3": ("Python",),
    "pypy": ("Python",),
    "pypy3": ("Python",),
    # JavaScript / TypeScript runtimes
    "node": ("JavaScript",),
    "nodejs": ("JavaScript",),
    "bun": ("JavaScript", "TypeScript"),
    "qjs": ("JavaScript",),
    "rhino": ("JavaScript",),
    "v8": ("JavaScript",),
    "deno": ("TypeScript",),
    "ts-node": ("TypeScript",),
    # shells
    "sh": ("Shell",),
    "bash": ("Shell",),
    "zsh": ("Shell",),
    "dash": ("Shell",),
    "ash": ("Shell",),
    "ksh": ("Shell",),
    "mksh": ("Shell",),
    "pdksh": ("Shell",),
    "rc": ("Shell",),
    "csh": ("Tcsh",),
    "tcsh": ("Tcsh",),
    "fish": ("fish",),
    "nu": ("Nushell",),
    "elvish": ("Elvish",),
    "pwsh": ("PowerShell",),
    # Ruby family
    "ruby": ("Ruby",),
    "jruby": ("Ruby",),
    "macruby": ("Ruby",),
    "rake": ("Ruby",),
    "rbx": ("Ruby",),
    # Perl / Raku
    "perl": ("Perl", "Raku"),
    "cperl": ("Perl",),
    "perl6": ("Raku",),
    "raku": ("Raku",),
    "rakudo": ("Raku",),
    # PHP
    "php": ("PHP",),
    "php5": ("PHP",),
    "php7": ("PHP",),
    "php8": ("PHP",),
    # JVM scripting
    "scala": ("Scala",),
    "groovy": ("Groovy",),
    "kotlin": ("Kotlin",),
    "kscript": ("Kotlin",),
    "clojure": ("Clojure",),
    "bb": ("Clojure",),
    "boot": ("Clojure",),
    "lein": ("Clojure",),
    "ioke": ("Ioke",),
    # Lua
    "lua": ("Lua",),
    "luajit": ("Lua",),
    "moon": ("MoonScript",),
    "fennel": ("Fennel",),
    # Tcl
    "tclsh": ("Tcl",),
    "wish": ("Tcl",),
    # Awk family
    "awk": ("Awk",),
    "gawk": ("Awk",),
    "mawk": ("Awk",),
    "nawk": ("Awk",),
    # misc dynamic languages
    "Rscript": ("R",),
    "julia": ("Julia",),
    "elixir": ("Elixir",),
    "escript": ("Erlang",),
    "crystal": ("Crystal",),
    "dart": ("Dart",),
    "swift": ("Swift",),
    "nim": ("Nim",),
    "janet": ("Janet",),
    "jq": ("jq",),
    "io": ("Io",),
    "hy": ("Hy",),
    "pike": ("Pike",),
    "newlisp": ("NewLisp",),
    "picolisp": ("PicoLisp",),
    "pil": ("PicoLisp",),
    "rexx": ("REXX",),
    "regina": ("REXX",),
    "gst": ("Smalltalk",),
    "coffee": ("CoffeeScript",),
    "osascript": ("AppleScript",),
    "expect": ("Expect",),
    "gnuplot": ("Gnuplot",),
    "sed": ("sed",),
    "gsed": ("sed",),
    "minised": ("sed",),
    "make": ("Makefile",),
    "gmake": ("Makefile",),
    # compiled-language script runners
    "runghc": ("Haskell",),
    "runhaskell": ("Haskell",),
    "runhugs": ("Haskell",),
    "stack": ("Haskell",),
    "ocaml": ("OCaml",),
    "ocamlrun": ("OCaml",),
    "ocamlscript": ("OCaml",),
    "sbcl": ("Common Lisp",),
    "ccl": ("Common Lisp",),
    "clisp": ("Common Lisp",),
    "ecl": ("Common Lisp",),
    "lisp": ("Common Lisp",),
    "guile": ("Scheme",),
    "bigloo": ("Scheme",),
    "csi": ("Scheme",),
    "chicken": ("Scheme",),
    "gosh": ("Scheme",),
    "scheme": ("Scheme",),
    "racket": ("Racket",),
    "dmd": ("D",),
    "ldc": ("D",),
    "rdmd": ("D",),
    "tcc": ("C",),
    "instantfpc": ("Pascal",),
    "scsynth": ("SuperCollider",),
    "sclang": ("SuperCollider",),
    "parrot": ("Parrot Assembly", "Parrot Internal Representation"),
    "cwl-runner": ("Common Workflow Language",),
    "qmake": ("QMake",),
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
