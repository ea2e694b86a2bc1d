"""Tests for the driver-side python sources (ENTSO-E, MFFBAS) and the EVM
contract destination — injected-transport fakes, reference-shape outputs."""

from __future__ import annotations

import json

import pandas as pd
import pytest

from core_spark.sources.python_sources import (
    EVMContractDestination,
    PythonEntsoeSource,
    PythonMFFBASSource,
    to_spark,
)

# ------------------------------------------------------------------ entsoe


class _FakeEntsoeClient:
    def __init__(self, api_key):
        self.api_key = api_key

    def query_day_ahead_prices(self, country, start, end):
        idx = pd.date_range(start, end, freq="h", tz="UTC")[:4]
        # unnamed, like EntsoePandasClient's day-ahead price series —
        # pd.DataFrame(named_series, columns=["Price"]) would filter-to-empty
        return pd.Series([10.0, 12.5, 11.0, 9.5], index=idx)


def test_entsoe_source_shape():
    src = PythonEntsoeSource(
        api_key="k",
        start="2024-01-01",
        end="2024-01-02",
        country_code="NL",
        client_factory=_FakeEntsoeClient,
    )
    assert src.pre_read_validation()
    out = src.read_batch()
    assert list(out.columns) == ["Price", "Name"]
    assert (out["Name"] == "APX").all()
    assert out["Price"].iloc[1] == 12.5
    with pytest.raises(NotImplementedError):
        src.read_stream()


def test_entsoe_requires_injected_client():
    src = PythonEntsoeSource("k", "2024-01-01", "2024-01-02", "NL")
    with pytest.raises(NotImplementedError, match="client_factory"):
        src.read_batch()


def test_to_spark_lift(spark):
    src = PythonEntsoeSource(
        "k", "2024-01-01", "2024-01-02", "NL", client_factory=_FakeEntsoeClient
    )
    sdf = to_spark(spark, src.read_batch())
    assert sdf.count() == 4
    assert "Price" in sdf.columns


# ------------------------------------------------------------------ mffbas


def _mffbas_payload():
    def series(category, direction):
        return {
            "calendar_date": "2024-01-01",
            "pFdate_version": "1",
            "profileCategory": category,
            "determinedConsumption": None,
            "direction": direction,
            "resolution": "PT15M",
            "profileStatus_quality": "D",
            # pos 96 exists in the API payload and must be filtered out
            "PointList": [{"pos": p, "qnt": float(p) + (1000 if direction == "E18" else 0)} for p in range(97)],
        }

    return {"Detail_SeriesList": [series("E1A", "E17"), series("E1A", "E18")]}


def test_mffbas_prepare_pivots_profiles():
    src = PythonMFFBASSource("2024-01-01", "2024-01-02", fetch=lambda p: _mffbas_payload())
    out = src.read_batch()
    # two profile columns (E17->A, E18->I) + year_created
    assert sorted(out.columns) == ["E1A_A", "E1A_I", "year_created"]
    assert len(out) == 96  # pos 96 dropped
    # 15-minute offsets from calendar_date
    assert out.index[1] - out.index[0] == pd.Timedelta(minutes=15)
    assert out["E1A_A"].iloc[5] == 5.0
    assert out["E1A_I"].iloc[5] == 1005.0
    assert (out["year_created"] == "2024-01-01").all()


def test_mffbas_request_params_and_validation():
    seen = {}

    def fetch(params):
        seen.update(params)
        return _mffbas_payload()

    PythonMFFBASSource("2024-05-01", "2024-05-20", fetch=fetch).read_batch()
    assert seen == {
        "startdate": "2024-05-01",
        "enddate": "2024-05-20",
        "pftype": "STANDARD",
        "product": "023",
    }
    with pytest.raises(ValueError, match="2023-04-01"):
        PythonMFFBASSource("2023-01-01", "2023-01-05", fetch=fetch).read_batch()
    with pytest.raises(ValueError, match="31 days"):
        PythonMFFBASSource("2024-01-01", "2024-03-01", fetch=fetch).read_batch()
    with pytest.raises(NotImplementedError):
        PythonMFFBASSource("2024-01-01", "2024-01-02").read_stream()


# --------------------------------------------------------------------- evm


class _FakeFn:
    def __init__(self, name):
        self.name = name

    def __call__(self, *params):
        self.params = params
        return self

    def build_transaction(self, tx):
        return {**tx, "data": f"{self.name}{self.params}"}


class _FakeEth:
    def __init__(self):
        self.sent = []
        self.account = self

    def get_transaction_count(self, account):
        return 7

    def contract(self, address, abi):
        self.functions = type("Fns", (), {"transfer": _FakeFn("transfer")})()
        return self

    def sign_transaction(self, tx, key):
        self.signed = tx
        return type("Signed", (), {"rawTransaction": b"\x12\x34"})()

    def send_raw_transaction(self, raw):
        self.sent.append(raw)
        return b"\xab\xcd"

    def wait_for_transaction_receipt(self, tx_hash):
        self.receipt_for = tx_hash
        return {"status": 1}


class _FakeWeb3:
    def __init__(self, url):
        self.url = url
        self.eth = _FakeEth()

    def to_hex(self, b):
        return "0x" + b.hex()


def test_evm_destination_signs_and_sends():
    dest = EVMContractDestination(
        url="http://node",
        account="0xacc",
        private_key="0xkey",
        abi=json.dumps([{"name": "transfer", "type": "function"}]),
        contract="0xcontract",
        function_name="transfer",
        function_params=("0xto", 5),
        transaction={"gas": 21000},
        web3_factory=_FakeWeb3,
    )
    tx_hash = dest.write_batch()
    assert tx_hash == "0xabcd"
    # nonce and from were filled in before signing (evm.py:113-118 parity)
    assert dest.web3.eth.signed["nonce"] == 7
    assert dest.web3.eth.signed["from"] == "0xacc"
    assert dest.web3.eth.signed["gas"] == 21000
    assert dest.web3.eth.receipt_for == b"\xab\xcd"
    with pytest.raises(NotImplementedError):
        dest.write_stream()


def test_evm_requires_injected_web3():
    with pytest.raises(NotImplementedError, match="web3_factory"):
        EVMContractDestination(
            url="u", account="a", private_key="p", abi="[]"
        )
