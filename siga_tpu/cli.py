"""`siga` command-line interface.

Git-style subcommand dispatch mirroring the reference
(/root/reference/src/main.cpp:17-84 + runner.h): per-command getopt tables,
`--ini` config file merged under CLI options, repeated flags concatenated with
':'.
"""
from __future__ import annotations

import configparser
import getopt
import sys
from typing import Dict, List, Tuple

from .constants import COMMAND_RANKS

# command -> (shortopts, [(long, has_arg, short_alias)])
OPTION_TABLES: Dict[str, Tuple[str, List[Tuple[str, bool, str]]]] = {
    "preprocess": (
        "c:s:o:p:q:f:m:h",
        [
            ("log4cxx", True, "c"),
            ("ini", True, "s"),
            ("out", True, "o"),
            ("pe-mode", True, ""),
            ("pe-orientation", True, ""),
            ("with-index", False, ""),
            ("phred64", False, ""),
            ("quality-trim", True, "q"),
            ("quality-filter", True, "f"),
            ("min-length", True, "m"),
            ("hard-clip", True, ""),
            ("sample-rate", True, ""),
            ("no-primer-check", False, ""),
            ("seed", True, ""),
            ("help", False, "h"),
        ],
    ),
    "index": (
        "c:s:a:t:p:g:h",
        [
            ("log4cxx", True, "c"),
            ("ini", True, "s"),
            ("prefix", True, "p"),
            ("threads", True, "t"),
            ("algorithm", True, "a"),
            ("no-reverse", False, ""),
            ("no-forward", False, ""),
            ("help", False, "h"),
        ],
    ),
    "correct": (
        "c:s:p:t:a:k:x:o:h",
        [
            ("log4cxx", True, "c"),
            ("ini", True, "s"),
            ("prefix", True, "p"),
            ("threads", True, "t"),
            ("algorithm", True, "a"),
            ("kmer-size", True, "k"),
            ("kmer-threshold", True, "x"),
            ("kmer-rounds", True, ""),
            ("kmer-count-offset", True, ""),
            ("out", True, "o"),
            ("engine", True, ""),
            ("help", False, "h"),
        ],
    ),
    "overlap": (
        "c:s:t:p:m:xh",
        [
            ("log4cxx", True, "c"),
            ("ini", True, "s"),
            ("prefix", True, "p"),
            ("threads", True, "t"),
            ("batch-size", True, ""),
            ("min-overlap", True, "m"),
            ("exhaustive", False, "x"),
            ("no-opposite-strand", False, ""),
            ("engine", True, ""),
            ("help", False, "h"),
        ],
    ),
    "assemble": (
        "c:s:p:t:m:x:n:C:l:A:a:d:N:G:T:h",
        [
            ("log4cxx", True, "c"),
            ("ini", True, "s"),
            ("prefix", True, "p"),
            ("min-overlap", True, "m"),
            ("max-edges", True, ""),
            ("threads", True, "t"),
            ("batch-size", True, ""),
            ("pe-mode", True, ""),
            ("with-index", False, ""),
            ("max-distance", True, ""),
            ("insert-size", True, ""),
            ("insert-size-delta", True, ""),
            ("cut-terminal", True, "x"),
            ("min-branch-length", True, "n"),
            ("min-branch-coverage", True, "C"),
            ("max-overlap-delta", True, "d"),
            ("max-overlap-carefully", False, ""),
            ("min-chimeric-length", True, "l"),
            ("min-chimeric-coverage", True, "A"),
            ("max-chimeric-delta", True, "a"),
            ("num-reads", True, "N"),
            ("genome-size", True, "G"),
            ("uniq-threshold", True, "T"),
            ("ai-model", True, "M"),
            ("max-search-nodes", True, ""),
            ("min-linkedread-length", True, ""),
            ("min-linkedread-coverage", True, ""),
            ("help", False, "h"),
        ],
    ),
    "rmdup": (
        "c:s:t:p:d:h",
        [
            ("log4cxx", True, "c"),
            ("ini", True, "s"),
            ("prefix", True, "p"),
            ("threads", True, "t"),
            ("sample-rate", True, "d"),
            ("help", False, "h"),
        ],
    ),
    "subgraph": (
        "o:m:h",
        [
            ("out", True, "o"),
            ("min-overlap", True, "m"),
            ("size", True, ""),
            ("max-edges", True, ""),
            ("help", False, "h"),
        ],
    ),
    "match": (
        "c:s:p:t:l:h",
        [
            ("log4cxx", True, "c"),
            ("ini", True, "s"),
            ("prefix", True, "p"),
            ("threads", True, "t"),
            ("max-length", True, "l"),
            ("no-opposite-strand", False, ""),
            ("help", False, "h"),
        ],
    ),
    "preqc": (
        "c:s:o:t:h",
        [
            ("log4cxx", True, "c"),
            ("ini", True, "s"),
            ("prefix", True, "o"),
            ("threads", True, "t"),
            ("simple", False, ""),
            ("sample-rate", True, ""),
            ("kmer", True, ""),
            ("seed", True, ""),
            ("help", False, "h"),
        ],
    ),
    "gan": (
        "c:s:p:t:m:h",
        [
            ("log4cxx", True, "c"),
            ("ini", True, "s"),
            ("prefix", True, "p"),
            ("threads", True, "t"),
            ("min-overlap", True, "m"),
            ("ref", True, ""),
            ("rounds", True, ""),
            ("help", False, "h"),
        ],
    ),
}

DESCRIPTIONS = {
    "preprocess": "filter and quality-trim reads",
    "index": "build the BWT and FM-index for a set of reads",
    "correct": "correct sequencing errors in reads",
    "overlap": "compute overlaps between reads",
    "assemble": "generate contigs from an assembly graph",
    "subgraph": "extract a subgraph from a graph",
    "rmdup": "duplicate reads removal",
    "preqc": "preform pre-assembly quality checks",
    "match": "match a set of reads with ref",
    "gan": "emit ML training data for edge classification",
}


def parse_options(command: str, argv: List[str]) -> Tuple[dict, List[str]]:
    shortopts, longspec = OPTION_TABLES[command]
    longopts = [name + ("=" if has_arg else "") for name, has_arg, _s in longspec]
    short_to_long = {s: name for name, _h, s in longspec if s}
    pairs, args = getopt.gnu_getopt(argv, shortopts, longopts)
    opts: dict = {}
    for key, val in pairs:
        if key.startswith("--"):
            name = key[2:]
        else:
            name = short_to_long.get(key[1:], key[1:])
        has_arg = next((h for n, h, _s in longspec if n == name), False)
        if not has_arg:
            opts[name] = True
        elif name in opts:
            opts[name] = f"{opts[name]}:{val}"  # repeated flags concatenate
        else:
            opts[name] = val

    # merge --ini file options under CLI precedence
    if "ini" in opts:
        parser = configparser.ConfigParser()
        parser.read(opts["ini"])
        merged: dict = {}
        for section in parser.sections():
            for k, v in parser.items(section):
                merged[k] = v
        for k, v in parser.defaults().items():
            merged[k] = v
        merged.update(opts)
        opts = merged
    return opts, args


def help_text() -> str:
    lines = [
        "siga-tpu: a TPU-native string graph assembler",
        "",
        "Usage: siga <command> [<args>]",
        "",
        "The most commonly used siga commands are:",
    ]
    visible = [c for c in OPTION_TABLES if COMMAND_RANKS.get(c, 1000) < 1000]
    visible.sort(key=lambda c: (COMMAND_RANKS.get(c, 1000), c))
    width = max(len(c) for c in visible) + 2
    for c in visible:
        lines.append(f"   {c.ljust(width)}{DESCRIPTIONS[c]}")
    lines.append("")
    lines.append("See 'siga <command> -h' to read about a specific subcommand.")
    return "\n".join(lines)


def main(argv: List[str] = None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if not argv or argv[0] in ("-h", "--help"):
        print(help_text())
        return 0 if argv else 1
    if argv[0] in ("-v", "--version"):
        print("siga-tpu version 0.1.0")
        return 0
    command = argv[0]
    if command not in OPTION_TABLES:
        print(help_text())
        return 1
    opts, args = parse_options(command, argv[1:])

    if command == "preprocess":
        from .commands import preprocess as mod
    elif command == "index":
        from .commands import index_cmd as mod
    elif command == "correct":
        from .commands import correct_cmd as mod
    elif command == "overlap":
        from .commands import overlap_cmd as mod
    elif command == "assemble":
        from .commands import assemble_cmd as mod
    elif command == "rmdup":
        from .commands import rmdup_cmd as mod
    elif command == "subgraph":
        from .commands import subgraph_cmd as mod
    elif command == "match":
        from .commands import match_cmd as mod
    elif command == "preqc":
        from .commands import preqc_cmd as mod
    elif command == "gan":
        from .commands import gan_cmd as mod
    else:
        print(help_text())
        return 1

    if opts.get("help"):
        print(help_text())
        return 256
    return mod.run(opts, args)


if __name__ == "__main__":
    sys.exit(main())
