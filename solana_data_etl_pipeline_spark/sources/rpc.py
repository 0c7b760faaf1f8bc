"""Solana JSON-RPC source client (reference S-layer).

Parity with reference src/rpc.rs:

- S1 rpc_call: JSON-RPC 2.0 POST, retry on 429/5xx with exponential
  backoff 2^retries seconds up to max_retries (src/rpc.rs:61-108).
- S2 token-bucket rate limiting at rate_limit_per_second
  (src/rpc.rs:48-52,63; default 50/s src/config.rs:49-52).
- S3-S8 typed wrappers: get_slot, get_block, get_transaction,
  get_signatures_for_address, get_program_accounts, get_block_height
  (src/rpc.rs:110-213).

The HTTP transport is injectable so ingest logic is testable without a
network (tests use MockTransport / fixtures.FixtureRpcClient). Uses
stdlib urllib -- no extra dependencies.

Scale note: one client instance per executor task (the reference's
per-chunk warehouse/rpc instantiation, src/backfill.rs:46-48). A
*global* rate limit cannot be enforced across distributed tasks
without coordination; the engine bounds aggregate rate by
(concurrent tasks x per-task rate), the same semantics as the
reference's semaphore x per-client limiter.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request
from collections.abc import Callable
from typing import Any

from solana_data_etl_pipeline_spark.config import RpcConfig
from solana_data_etl_pipeline_spark.errors import RpcError

Transport = Callable[[str, bytes, int], tuple[int, bytes]]


def _urllib_transport(url: str, body: bytes, timeout: int) -> tuple[int, bytes]:
    req = urllib.request.Request(url, data=body, headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return resp.status, resp.read()
    except urllib.error.HTTPError as e:  # non-2xx still carries a status
        return e.code, e.read()


class TokenBucket:
    """S2: simple token bucket -- refill `rate` tokens/second, block
    until a token is available (reference src/rpc.rs:48-52)."""

    def __init__(self, rate: float, clock: Callable[[], float] = time.monotonic, sleep=time.sleep):
        self.rate = max(rate, 0.001)
        self.capacity = max(rate, 1.0)
        self.tokens = self.capacity
        self.updated = clock()
        self.clock = clock
        self.sleep = sleep

    def until_ready(self) -> None:
        while True:
            now = self.clock()
            self.tokens = min(self.capacity, self.tokens + (now - self.updated) * self.rate)
            self.updated = now
            if self.tokens >= 1.0:
                self.tokens -= 1.0
                return
            self.sleep((1.0 - self.tokens) / self.rate)


class RpcClient:
    def __init__(
        self,
        config: RpcConfig | None = None,
        transport: Transport = _urllib_transport,
        sleep=time.sleep,
    ):
        self.config = config or RpcConfig()
        self.transport = transport
        self.sleep = sleep
        self.rate_limiter = TokenBucket(self.config.rate_limit_per_second, sleep=sleep)
        self._next_id = 0

    # S1 ---------------------------------------------------------------
    def rpc_call(self, method: str, params: list[Any]) -> Any:
        """POST a JSON-RPC 2.0 request; retry 429/5xx with exponential
        backoff 2^retries seconds (reference src/rpc.rs:85-98)."""
        self._next_id += 1
        body = json.dumps(
            {"jsonrpc": "2.0", "id": self._next_id, "method": method, "params": params}
        ).encode()
        retries = 0
        while True:
            self.rate_limiter.until_ready()
            try:
                status, payload = self.transport(self.config.url, body, self.config.timeout_seconds)
            except Exception as e:
                status, payload = 599, str(e).encode()
            if status == 429 or status >= 500:
                if retries >= self.config.max_retries:
                    raise RpcError(f"{method}: giving up after {retries} retries (status {status})")
                self.sleep(2**retries)
                retries += 1
                continue
            if status != 200:
                raise RpcError(f"{method}: HTTP {status}")
            doc = json.loads(payload)
            if "error" in doc and doc["error"]:
                raise RpcError(f"{method}: {doc['error']}")
            return doc.get("result")

    # S3 ---------------------------------------------------------------
    def get_slot(self) -> int:
        """Chain tip at confirmed commitment (reference src/rpc.rs:110-115)."""
        return int(self.rpc_call("getSlot", [{"commitment": "confirmed"}]))

    # S4 ---------------------------------------------------------------
    def get_block(self, slot: int, encoding: str = "jsonParsed") -> dict | None:
        """Full block; None for skipped slots (reference src/rpc.rs:117-137)."""
        result = self.rpc_call(
            "getBlock",
            [
                slot,
                {
                    "encoding": encoding,
                    "transactionDetails": "full",
                    "rewards": False,
                    "maxSupportedTransactionVersion": 0,
                },
            ],
        )
        if result is None:
            return None
        result.setdefault("slot", slot)
        return result

    # S5 ---------------------------------------------------------------
    def get_transaction(self, signature: str, encoding: str = "jsonParsed") -> dict | None:
        """Single transaction by signature (reference src/rpc.rs:139-160)."""
        return self.rpc_call(
            "getTransaction",
            [signature, {"encoding": encoding, "maxSupportedTransactionVersion": 0}],
        )

    # S6 ---------------------------------------------------------------
    def get_signatures_for_address(
        self, address: str, limit: int = 1000, before: str | None = None, until: str | None = None
    ) -> list[dict]:
        """Paged signature scan (reference src/rpc.rs:162-187)."""
        opts: dict[str, Any] = {"limit": limit}
        if before:
            opts["before"] = before
        if until:
            opts["until"] = until
        return self.rpc_call("getSignaturesForAddress", [address, opts]) or []

    # S7 ---------------------------------------------------------------
    def get_program_accounts(self, program_id: str, filters: list[dict] | None = None) -> list[dict]:
        """Account scan with filters (reference src/rpc.rs:189-208)."""
        opts: dict[str, Any] = {"encoding": "jsonParsed"}
        if filters:
            opts["filters"] = filters
        return self.rpc_call("getProgramAccounts", [program_id, opts]) or []

    # S8 ---------------------------------------------------------------
    def get_block_height(self) -> int:
        """reference src/rpc.rs:210-213."""
        return int(self.rpc_call("getBlockHeight", []))
