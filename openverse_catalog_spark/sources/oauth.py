"""OAuth2 token lifecycle for providers whose APIs require bearer auth
(reference ``catalog/dags/oauth2/oauth2.py`` + the
``OAuth2DelayedRequester`` at ``catalog/dags/common/requester.py:164-168``).

The reference keeps three Airflow Variables — auth codes, client
secrets, access/refresh token pairs — and two maintenance DAGs
(authorize_dag.py, token_refresh_dag.py) that walk every registered
provider. Here the same lifecycle is a plain object with the HTTP
transport injected, so the flows (authorize-from-code, scheduled
refresh, 401-retry) are deterministic and unit-testable, and the fetch
loop stays driver-side like every other provider transport (executors
never hold credentials — SURVEY §1.4).
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from dataclasses import dataclass


@dataclass(frozen=True)
class OAuthProvider:
    """Registration entry (oauth2.py:13-30): where to trade an auth code
    for tokens and where to refresh them."""

    name: str
    auth_url: str
    refresh_url: str


class MissingSecretsError(ValueError):
    pass


class MissingTokenError(KeyError):
    pass


class OAuth2TokenStore:
    """The three-variable token store (oauth2.py:21-55): auth codes
    (one-shot), client secrets (at least ``client_id``), and
    access/refresh token pairs, all keyed by provider name.

    ``transport(url, payload) -> dict`` plays the token-endpoint POST and
    must return a dict containing ``access_token`` and ``refresh_token``.
    """

    def __init__(self, transport: Callable[[str, dict], dict]) -> None:
        self._transport = transport
        self.auth_codes: dict[str, str] = {}
        self.secrets: dict[str, dict] = {}
        self.tokens: dict[str, dict[str, str]] = {}

    def _get_secrets(self, name: str) -> dict:
        secrets = self.secrets.get(name)
        if secrets is None or "client_id" not in secrets:
            raise MissingSecretsError(
                f"Authorization requested for provider {name} but no secrets "
                "were provided (a client_id is required)."
            )
        return secrets

    def _update_tokens(self, name: str, new: dict) -> None:
        # only the access/refresh pair is persisted (oauth2.py:43-55)
        self.tokens[name] = {
            "access_token": new["access_token"],
            "refresh_token": new["refresh_token"],
        }

    def authorize_providers(self, providers: Iterable[OAuthProvider]) -> list[str]:
        """One-shot code->token exchange for every provider that has a
        pending auth code (oauth2.py:97-119); consumed codes are removed.
        Returns the names that were authorized."""
        done = []
        for provider in providers:
            if provider.name not in self.auth_codes:
                continue
            secrets = self._get_secrets(provider.name)
            code = self.auth_codes[provider.name]
            new = self._transport(provider.auth_url, {"code": code, **secrets})
            self._update_tokens(provider.name, new)
            del self.auth_codes[provider.name]
            done.append(provider.name)
        return done

    def refresh(self, provider: OAuthProvider) -> None:
        """Trade the stored refresh token for a fresh pair
        (oauth2.py:122-143). Raises MissingTokenError when the provider
        was never authorized (the reference skips the task)."""
        if provider.name not in self.tokens:
            raise MissingTokenError(
                f"Provider {provider.name} has no stored tokens; authorize first."
            )
        secrets = self._get_secrets(provider.name)
        refresh_token = self.tokens[provider.name]["refresh_token"]
        new = self._transport(
            provider.refresh_url, {"refresh_token": refresh_token, **secrets}
        )
        self._update_tokens(provider.name, new)

    def access_token(self, name: str) -> str:
        if name not in self.tokens:
            raise MissingTokenError(f"Access token not found for provider {name}")
        return self.tokens[name]["access_token"]


def oauth_fetch_fn(
    store: OAuth2TokenStore,
    provider: OAuthProvider,
    http_get: Callable[[dict, dict], dict | None],
):
    """Bearer-authenticated transport for the paged fetch loop — the
    OAuth2DelayedRequester analog (requester.py:164-168): every request
    carries ``Authorization: Bearer <access token>``; a 401-shaped
    response (``{"unauthorized": True}`` from the transport) triggers ONE
    refresh + retry, mirroring the session re-auth the reference gets
    from requests-oauthlib.

    ``http_get(params, headers) -> dict | None`` is the raw transport.
    """

    def fetch(params: dict) -> dict | None:
        headers = {"Authorization": f"Bearer {store.access_token(provider.name)}"}
        response = http_get(params, headers)
        if isinstance(response, dict) and response.get("unauthorized"):
            store.refresh(provider)
            headers = {
                "Authorization": f"Bearer {store.access_token(provider.name)}"
            }
            response = http_get(params, headers)
            if isinstance(response, dict) and response.get("unauthorized"):
                return None
        return response

    return fetch


FREESOUND_OAUTH = OAuthProvider(
    name="freesound",
    auth_url="https://freesound.org/apiv2/oauth2/access_token/",
    refresh_url="https://freesound.org/apiv2/oauth2/access_token/",
)
