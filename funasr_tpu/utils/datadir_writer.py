"""Kaldi-style output directory writer (reference
funasr/utils/datadir_writer.py ``DatadirWriter``): nested dirs of
``key value`` text files, e.g. ``output_dir/1best_recog/{text,token}``.

Usage mirrors the reference::

    writer = DatadirWriter(out_dir)
    ibest = writer["1best_recog"]
    ibest["text"][key] = "..."     # appends a line to out_dir/1best_recog/text
    writer.close()
"""

from __future__ import annotations

import os
from typing import Dict, Optional


class DatadirWriter:
    def __init__(self, path: str):
        self.path = path
        self._children: Dict[str, "DatadirWriter"] = {}
        self._file: Optional[object] = None

    def __getitem__(self, name: str) -> "DatadirWriter":
        if self._file is not None:
            raise TypeError(f"{self.path} is already an output file")
        if name not in self._children:
            self._children[name] = DatadirWriter(os.path.join(self.path, name))
        return self._children[name]

    def __setitem__(self, key: str, value: str):
        if self._children:
            raise TypeError(f"{self.path} is a directory node")
        if self._file is None:
            os.makedirs(os.path.dirname(self.path), exist_ok=True)
            self._file = open(self.path, "a", encoding="utf-8")
        self._file.write(f"{key} {value}\n")
        self._file.flush()

    def close(self):
        if self._file is not None:
            self._file.close()
            self._file = None
        for c in self._children.values():
            c.close()
