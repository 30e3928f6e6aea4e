"""Cloud credential-provider API surface (reference: io/cloud/credential_provider/).

This environment is zero-egress with local-filesystem IO only, so providers
are accepted anywhere the reference accepts them (scan_*/sink_* take
``credential_provider=``) and are simply never invoked for local paths —
the same behavior the reference has for file:// sources. Instantiating one
is allowed; calling it raises, since no cloud backend exists to hand
credentials to.
"""

from __future__ import annotations

from typing import Any


class CredentialProvider:
    """Base class for credential providers."""

    def __call__(self) -> Any:
        raise NotImplementedError(
            "cloud object stores are unavailable in this build (local IO only)"
        )


class CredentialProviderFunction(CredentialProvider):
    def __init__(self, function: Any = None) -> None:
        self.function = function


CredentialProviderFunctionReturn = tuple


class CredentialProviderAWS(CredentialProvider):
    def __init__(self, *, profile_name: str | None = None, region_name: str | None = None, **kw: Any) -> None:
        self.profile_name = profile_name
        self.region_name = region_name


class CredentialProviderGCP(CredentialProvider):
    def __init__(self, *, scopes: Any = None, **kw: Any) -> None:
        self.scopes = scopes


class CredentialProviderAzure(CredentialProvider):
    def __init__(self, *, scopes: Any = None, tenant_id: str | None = None, **kw: Any) -> None:
        self.scopes = scopes
        self.tenant_id = tenant_id


# ---------------------------------------------------------------------------
# fsspec-backed object-store access (reference: polars-io/src/cloud/
# polars_object_store.rs). Any fsspec protocol works (s3/gs/az/http/memory);
# this zero-egress environment unit-tests against the memory:// filesystem.
# ---------------------------------------------------------------------------


def is_remote_path(path: Any) -> bool:
    s = str(path)
    return "://" in s and not s.startswith("file://")


def _fs_for(path: Any, storage_options: Any = None):
    import fsspec

    fs, _, paths = fsspec.get_fs_token_paths(
        str(path), storage_options=dict(storage_options or {})
    )
    return fs, paths


def expand_remote_paths(source: Any, suffix: str = "", storage_options: Any = None) -> tuple[str, ...]:
    """Glob/directory expansion on a remote filesystem (fsspec)."""
    fs, paths = _fs_for(source, storage_options)
    proto = fs.protocol if isinstance(fs.protocol, str) else fs.protocol[0]
    out: list[str] = []
    for p in paths:
        if suffix and fs.isdir(p):
            out.extend(fs.glob(p.rstrip("/") + f"/**/*{suffix}"))
        else:
            out.append(p)
    return tuple(f"{proto}://{p}" for p in sorted(out))


def open_remote(path: Any, mode: str = "rb", storage_options: Any = None):
    import fsspec

    return fsspec.open(str(path), mode, **dict(storage_options or {})).open()


class Catalog:
    """Unity Catalog client (reference: py-polars catalog/unity/client.py:47).

    The catalog REST API needs network egress, which this environment does
    not have; construction is allowed so the symbol round-trips, every call
    raises with a clear message.
    """

    def __init__(self, workspace_url: str, *, bearer_token: str | None = "auto", require_https: bool = True) -> None:
        if require_https and not str(workspace_url).startswith("https://"):
            msg = f"a non-HTTPS workspace_url requires require_https=False: {workspace_url!r}"
            raise ValueError(msg)
        self.workspace_url = workspace_url

    def __getattr__(self, name: str):
        def _unavailable(*a, **k):
            raise OSError(
                f"Catalog.{name}: the Unity Catalog REST API is unreachable "
                "(this build runs without network egress)"
            )

        return _unavailable
