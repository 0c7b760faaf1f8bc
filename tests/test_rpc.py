"""S-layer contract tests with an injected transport: retry/backoff on
429/5xx, give-up behavior, rate limiting, JSON-RPC error mapping,
skipped-slot None (no network, no sleeping -- clocks are injected)."""

import json

import pytest

from solana_data_etl_pipeline_spark.config import RpcConfig
from solana_data_etl_pipeline_spark.errors import RpcError
from solana_data_etl_pipeline_spark.sources.rpc import RpcClient, TokenBucket


def _ok(result):
    return 200, json.dumps({"jsonrpc": "2.0", "id": 1, "result": result}).encode()


class ScriptedTransport:
    """Returns queued (status, payload) responses; records requests."""

    def __init__(self, responses):
        self.responses = list(responses)
        self.requests = []

    def __call__(self, url, body, timeout):
        self.requests.append(json.loads(body))
        return self.responses.pop(0)


def _client(responses, max_retries=5):
    sleeps = []
    client = RpcClient(
        RpcConfig(url="http://test.invalid", max_retries=max_retries, rate_limit_per_second=10_000),
        transport=ScriptedTransport(responses),
        sleep=sleeps.append,
    )
    return client, sleeps


def test_retries_429_and_5xx_with_exponential_backoff():
    client, sleeps = _client([(429, b""), (500, b""), (503, b""), _ok(7)])
    assert client.rpc_call("getSlot", []) == 7
    assert sleeps == [1, 2, 4]  # 2^0, 2^1, 2^2 (reference backoff)


def test_gives_up_after_max_retries():
    client, _ = _client([(500, b"")] * 3, max_retries=2)
    with pytest.raises(RpcError, match="giving up after 2 retries"):
        client.rpc_call("getSlot", [])


def test_non_retryable_http_error_raises_immediately():
    client, sleeps = _client([(404, b"")])
    with pytest.raises(RpcError, match="HTTP 404"):
        client.rpc_call("getSlot", [])
    assert sleeps == []


def test_jsonrpc_error_field_raises():
    payload = json.dumps({"jsonrpc": "2.0", "id": 1, "error": {"code": -32009, "message": "skipped"}})
    client, _ = _client([(200, payload.encode())])
    with pytest.raises(RpcError, match="-32009"):
        client.rpc_call("getBlock", [1])


def test_transport_exception_is_retried():
    class FlakyTransport:
        def __init__(self):
            self.calls = 0

        def __call__(self, url, body, timeout):
            self.calls += 1
            if self.calls == 1:
                raise ConnectionError("boom")
            return _ok(3)

    sleeps = []
    client = RpcClient(
        RpcConfig(url="http://test.invalid", rate_limit_per_second=10_000),
        transport=FlakyTransport(),
        sleep=sleeps.append,
    )
    assert client.rpc_call("getSlot", []) == 3
    assert sleeps == [1]


def test_get_block_none_for_skipped_slot_and_slot_injected():
    client, _ = _client([_ok(None), _ok({"blockTime": 5, "transactions": []})])
    assert client.get_block(17) is None
    blk = client.get_block(19)
    assert blk["slot"] == 19  # injected when the RPC response omits it


def test_get_slot_params_include_commitment():
    client, _ = _client([_ok(123)])
    assert client.get_slot() == 123
    req = client.transport.requests[0]
    assert req["method"] == "getSlot"
    assert req["params"] == [{"commitment": "confirmed"}]


def test_token_bucket_blocks_when_empty():
    t = {"now": 0.0}
    sleeps = []

    def clock():
        return t["now"]

    def sleep(s):
        sleeps.append(s)
        t["now"] += s

    bucket = TokenBucket(rate=2.0, clock=clock, sleep=sleep)
    bucket.until_ready()  # capacity 2 -> immediate
    bucket.until_ready()  # drains the bucket
    bucket.until_ready()  # must wait ~0.5s for a refill
    assert sleeps and abs(sum(sleeps) - 0.5) < 1e-6
