"""validate-schema command.

Behavioral port of the reference CLI (reference:
bin/validate-schema:13-40, lib/commands/validate_schema.rb:23-128):
explicit-schema and ``-d`` detect modes, ``-s`` extra schemas,
``-f`` fail-fast, the exact "<file> is valid." / "<file><pointer>:
failed schema ...: <message>" output, empty-file and bad-syntax
errors — extended with a Parquet mode: when a data file is
``.parquet``, it is validated as a table through the Ray Data
vectorized path instead of as a single JSON document.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional

from ..document_store import DocumentStore
from ..expander import ReferenceExpander
from ..parser import Parser

SCHEMAS_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "schemas")


class ValidateSchema:
    def __init__(self):
        self.detect = False
        self.fail_fast = False
        self.extra_schemas: List[str] = []
        self.errors: List[str] = []
        self.messages: List[str] = []
        self._store: Optional[DocumentStore] = None

    def run(self, argv: List[str]) -> bool:
        if not self._initialize_store():
            return False

        schema = None
        if not self.detect:
            if not argv:
                return False
            schema_file = argv.pop(0)
            schema = self._parse(schema_file)
            if schema is None:
                return False

        if len(argv) < 1:
            return False

        for data_file in argv:
            if data_file.endswith(".parquet"):
                if not self._run_parquet(schema, data_file):
                    return False
                continue
            data = self._read_file(data_file)
            if data is None:
                return False

            if self.detect:
                schema_uri = data.get("$schema") if isinstance(data, dict) else None
                if not schema_uri:
                    self.errors = [f"{data_file}: No $schema tag for detection."]
                    return False
                schema = self._store.lookup_schema(schema_uri)
                if schema is None:
                    self.errors = [
                        f"{data_file}: Unknown $schema, try specifying one with -s."]
                    return False

            valid, errors = schema.validate(data, fail_fast=self.fail_fast)
            if valid:
                self.messages.append(f"{data_file} is valid.")
            else:
                self.errors = self._map_schema_errors(data_file, errors)

        return not self.errors

    def _run_parquet(self, schema, data_file: str) -> bool:
        """Table mode: vectorized validation over a Parquet file."""
        import pyarrow.parquet as pq

        from ..engine.table_validator import (
            compile_table_plan, validate_batch, verdict_mask)

        try:
            pf = pq.ParquetFile(data_file)
        except FileNotFoundError:
            self.errors = [f"{data_file}: No such file or directory."]
            return False
        plan = compile_table_plan(schema, pf.schema_arrow)
        n_bad = 0
        msgs: List[str] = []
        for rb in pf.iter_batches():
            import pyarrow as pa

            t = pa.Table.from_batches([rb])
            if self.fail_fast:
                ok = verdict_mask(t, plan)
                n_bad += int((~ok).sum())
                if n_bad:
                    msgs.append(f"{data_file}: invalid rows present.")
                    break
            else:
                v = validate_batch(t, plan)
                n_bad += v.num_rows
                for row in v.to_pylist():
                    msgs.append(
                        f"{data_file}{row['path']}: failed schema "
                        f"{row['schema_pointer']}: {row['message']}")
        if n_bad == 0:
            self.messages.append(f"{data_file} is valid.")
            return True
        self.errors = msgs
        return False

    def _initialize_store(self) -> bool:
        self._store = DocumentStore()
        for extra in self.extra_schemas:
            schema = self._parse(extra)
            if schema is None:
                return False
            self._store.add_schema(schema)
        return True

    def _map_schema_errors(self, file: str, errors) -> List[str]:
        return [f"{file}{e}" for e in errors]

    def _parse(self, file: str):
        schema_data = self._read_file(file)
        if schema_data is None:
            return None
        parser = Parser()
        schema = parser.parse(schema_data)
        if schema is None:
            self.errors = self._map_schema_errors(file, parser.errors)
            return None
        expander = ReferenceExpander()
        if not expander.expand(schema, store=self._store):
            self.errors = self._map_schema_errors(file, expander.errors)
            return None
        return schema

    def _read_file(self, file: str):
        try:
            with open(file) as fh:
                contents = fh.read()
        except FileNotFoundError:
            self.errors = [f"{file}: No such file or directory."]
            return None
        except IsADirectoryError:
            self.errors = [f"{file}: Is a directory."]
            return None
        except OSError as e:
            self.errors = [f"{file}: {e.strerror}."]
            return None
        if not contents:
            self.errors = [f"{file}: File is empty."]
            return None
        if os.path.splitext(file)[1] == ".yaml":
            try:
                import yaml

                return yaml.safe_load(contents)
            except ImportError:
                self.errors = [f"{file}: YAML support is unavailable."]
                return None
            except Exception:
                self.errors = [f"{file}: Invalid YAML."]
                return None
        try:
            return json.loads(contents)
        except ValueError:
            self.errors = [
                f"{file}: Invalid JSON. Try to validate using `jsonlint`."]
            return None
