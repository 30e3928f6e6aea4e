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
