"""Zero-dependency in-tree PEP 517/660 build backend.

Why this exists: the target container ships setuptools 65 WITHOUT the
`wheel` package, so the stock `setuptools.build_meta` backend cannot build
(editable) wheels — `pip install -e .` dies in `bdist_wheel`, and pip
cannot fetch `wheel` offline.  A wheel is just a zip with three metadata
files, so this backend assembles it with stdlib `zipfile` directly:

- ``build_editable``: a wheel holding a single ``.pth`` pointing at the
  source checkout (the classic editable layout) plus dist-info.
- ``build_wheel``: a wheel holding the real ``melody_join_spark`` tree.
- ``build_sdist``: a minimal tar.gz of the package + build files.

Project metadata (name/version/deps) is read from pyproject.toml with
stdlib tomllib; nothing here depends on anything outside the stdlib.
"""

from __future__ import annotations

import base64
import hashlib
import os
import tarfile
import tomllib
import zipfile
from pathlib import Path

_ROOT = Path(__file__).resolve().parent
_PACKAGE = "melody_join_spark"


def _meta() -> dict:
    with open(_ROOT / "pyproject.toml", "rb") as f:
        return tomllib.load(f)["project"]


def _dist_name(meta: dict) -> str:
    return meta["name"].replace("-", "_")


def _metadata_text(meta: dict) -> str:
    lines = [
        "Metadata-Version: 2.1",
        f"Name: {meta['name']}",
        f"Version: {meta['version']}",
    ]
    if "description" in meta:
        lines.append(f"Summary: {meta['description']}")
    if "requires-python" in meta:
        lines.append(f"Requires-Python: {meta['requires-python']}")
    for dep in meta.get("dependencies", []):
        lines.append(f"Requires-Dist: {dep}")
    for extra, deps in meta.get("optional-dependencies", {}).items():
        lines.append(f"Provides-Extra: {extra}")
        for dep in deps:
            lines.append(f'Requires-Dist: {dep}; extra == "{extra}"')
    return "\n".join(lines) + "\n"


def _record_entry(arcname: str, data: bytes) -> str:
    digest = base64.urlsafe_b64encode(hashlib.sha256(data).digest())
    return f"{arcname},sha256={digest.decode().rstrip('=')},{len(data)}"


def _write_wheel(path: Path, files: list[tuple[str, bytes]], meta: dict) -> None:
    dist = _dist_name(meta)
    info = f"{dist}-{meta['version']}.dist-info"
    files = list(files)
    files.append((f"{info}/METADATA", _metadata_text(meta).encode()))
    files.append(
        (
            f"{info}/WHEEL",
            b"Wheel-Version: 1.0\n"
            b"Generator: melody-join-spark in-tree backend\n"
            b"Root-Is-Purelib: true\nTag: py3-none-any\n",
        )
    )
    record = [_record_entry(a, d) for a, d in files]
    record.append(f"{info}/RECORD,,")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        for arcname, data in files:
            z.writestr(zipfile.ZipInfo(arcname, (2020, 1, 1, 0, 0, 0)), data)
        z.writestr(
            zipfile.ZipInfo(f"{info}/RECORD", (2020, 1, 1, 0, 0, 0)),
            "\n".join(record) + "\n",
        )


def _wheel_name(meta: dict) -> str:
    return f"{_dist_name(meta)}-{meta['version']}-py3-none-any.whl"


# --- PEP 517 -----------------------------------------------------------


def build_wheel(wheel_directory, config_settings=None, metadata_directory=None):
    meta = _meta()
    files = []
    pkg_root = _ROOT / _PACKAGE
    for p in sorted(pkg_root.rglob("*")):
        if p.is_file() and "__pycache__" not in p.parts:
            files.append((str(p.relative_to(_ROOT)).replace(os.sep, "/"), p.read_bytes()))
    name = _wheel_name(meta)
    _write_wheel(Path(wheel_directory) / name, files, meta)
    return name


def build_editable(wheel_directory, config_settings=None, metadata_directory=None):
    meta = _meta()
    pth = (f"{_dist_name(meta)}.pth", (str(_ROOT) + "\n").encode())
    name = _wheel_name(meta)
    _write_wheel(Path(wheel_directory) / name, [pth], meta)
    return name


def build_sdist(sdist_directory, config_settings=None):
    meta = _meta()
    base = f"{_dist_name(meta)}-{meta['version']}"
    out = Path(sdist_directory) / f"{base}.tar.gz"
    include = ["pyproject.toml", "setup.py", "_build_backend.py", "README.md", _PACKAGE]
    with tarfile.open(out, "w:gz") as t:
        for item in include:
            p = _ROOT / item
            if p.exists():
                t.add(p, arcname=f"{base}/{item}", filter=lambda ti: None if "__pycache__" in ti.name else ti)
    return out.name


def get_requires_for_build_wheel(config_settings=None):
    return []


def get_requires_for_build_editable(config_settings=None):
    return []


def get_requires_for_build_sdist(config_settings=None):
    return []
