"""CLI entry point: ``python -m json_schema_ray.cli``.

Mirrors the reference executable (reference: bin/validate-schema:6-40)
including usage text, stdout/stderr routing and exit codes.
"""

from __future__ import annotations

import argparse
import sys

from .commands.validate_schema import SCHEMAS_DIR, ValidateSchema


def print_usage(stream=None) -> None:
    stream = stream if stream is not None else sys.stderr
    stream.write("Usage: validate-schema <schema> <data>, ...\n")
    stream.write("       validate-schema -d <data>, ...\n")


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(add_help=True,
                                     usage="validate-schema <schema> <data>, ...")
    parser.add_argument("-d", "--detect", action="store_true",
                        help="Detect schema from $schema")
    parser.add_argument("-s", "--schema", action="append", default=[],
                        dest="extra_schemas",
                        help="Additional schema to use for references")
    parser.add_argument("-f", "--fail-fast", action="store_true",
                        help="Abort after encountering the first validation error")
    parser.add_argument("files", nargs="*")
    args = parser.parse_args(argv)

    command = ValidateSchema()
    command.fail_fast = args.fail_fast
    command.extra_schemas = list(args.extra_schemas)
    if args.detect:
        command.detect = True
        import os

        command.extra_schemas += [
            os.path.join(SCHEMAS_DIR, "schema.json"),
            os.path.join(SCHEMAS_DIR, "hyper-schema.json"),
        ]

    success = command.run(list(args.files))
    if success:
        for m in command.messages:
            sys.stdout.write(m + "\n")
        return 0
    if command.errors:
        for e in command.errors:
            sys.stderr.write(str(e) + "\n")
        return 1
    print_usage()
    return 1


if __name__ == "__main__":
    sys.exit(main())
