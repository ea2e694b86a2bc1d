"""Driver-side ("python" system-type) sources and the blockchain
destination — the reference's non-Spark component family
(pipelines/sources/python/entsoe.py:23-104, mffbas.py:26-156,
pipelines/destinations/blockchain/evm.py:21-160).

These produce one small pandas frame per call (day-ahead prices, standard
consumption profiles) or push a single contract transaction — dimension
inputs / control-plane outputs, never the fact path (see SCALE.md §4b).
Same engine policy as `sources.iso`: the network/chain client is INJECTED
(`client_factory` / `fetch` / `web3_factory`), because transports are a
deployment concern and the hard-wired clients of the reference
(EntsoePandasClient, requests.request, web3.Web3) are not installed here;
tests inject deterministic fakes. ``to_spark`` lifts the pandas result into
a typed Spark frame for joining against fact tables.
"""

from __future__ import annotations

from typing import Any, Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def _require_injected(obj, name: str, cls: str):
    if obj is None:
        raise NotImplementedError(
            f"{cls}: no {name} injected — the reference hard-wires a network "
            f"client here; pass {name}=<callable> (deployment concern)"
        )
    return obj


class PythonEntsoeSource:
    """ENTSO-E day-ahead price source (sources/python/entsoe.py:23-104).

    ``client_factory(api_key) -> client`` must return an object with the
    EntsoePandasClient contract: ``query_day_ahead_prices(country_code,
    start=Timestamp, end=Timestamp) -> pd.Series`` (the reference constructs
    EntsoePandasClient directly, entsoe.py:88-95).
    """

    def __init__(
        self,
        api_key: str,
        start: str,
        end: str,
        country_code: str,
        resolution: str = "60T",
        client_factory: Callable[[str], Any] | None = None,
    ) -> None:
        self.key = api_key
        self.start = pd.Timestamp(start, tz="UTC")
        self.end = pd.Timestamp(end, tz="UTC")
        self.country = country_code
        self.resolution = resolution
        self._client_factory = client_factory

    def pre_read_validation(self) -> bool:
        return True

    def post_read_validation(self) -> bool:
        return True

    def read_batch(self) -> pd.DataFrame:
        """Day-ahead prices as a pandas frame: Price column + Name='APX'
        (entsoe.py:88-96)."""
        factory = _require_injected(
            self._client_factory, "client_factory", type(self).__name__
        )
        client = factory(self.key)
        series = client.query_day_ahead_prices(self.country, start=self.start, end=self.end)
        df = pd.DataFrame(series, columns=["Price"])
        df["Name"] = "APX"
        return df

    def read_stream(self):
        raise NotImplementedError(
            "ENTSO-E connector does not support the stream operation."
        )


class PythonMFFBASSource:
    """MFFBAS standard consumption profiles source
    (sources/python/mffbas.py:26-156): profile fractions per 15-minute
    position, pivoted to one column per profile.

    ``fetch(params: dict) -> dict`` returns the API's JSON payload
    (mffbas.py:83-103 GETs the EDSN gateway with these params). The API
    caps requests at 31 days and has no data before 2023-04-01 — validated
    here instead of failing server-side.
    """

    def __init__(
        self,
        start: str,
        end: str,
        fetch: Callable[[dict], dict] | None = None,
    ) -> None:
        self.start = start
        self.end = end
        self._fetch = fetch

    def pre_read_validation(self) -> bool:
        if pd.Timestamp(self.start) < pd.Timestamp("2023-04-01"):
            raise ValueError("MFFBAS API has no profile fractions before 2023-04-01")
        if pd.Timestamp(self.end) - pd.Timestamp(self.start) > pd.Timedelta(days=31):
            raise ValueError("MFFBAS API requests are limited to 31 days at a time")
        return True

    def post_read_validation(self) -> bool:
        return True

    def _pull_data(self) -> dict:
        fetch = _require_injected(self._fetch, "fetch", type(self).__name__)
        return fetch(
            {
                "startdate": self.start,
                "enddate": self.end,
                "pftype": "STANDARD",
                "product": "023",
            }
        )

    def _prepare_data(self) -> pd.DataFrame:
        """Explode PointList, label profiles, convert pos to a 15-minute
        offset, pivot profiles to columns (mffbas.py:105-136)."""
        data = self._pull_data()
        df = pd.DataFrame.from_dict(data["Detail_SeriesList"])
        df = df.rename(columns={"calendar_date": "Versienr"})
        df = df.explode("PointList")
        df = pd.concat(
            [df.drop(["PointList"], axis=1), df["PointList"].apply(pd.Series)], axis=1
        )
        df["direction"] = df["direction"].map({"E17": "A", "E18": "I"})
        df["profiles"] = df[
            ["profileCategory", "determinedConsumption", "direction"]
        ].agg(lambda x: "_".join(x.dropna()), axis=1)
        df["Versienr"] = pd.to_datetime(df["Versienr"]) + pd.to_timedelta(
            df["pos"] * 15, unit="min"
        )
        df = df[df["pos"] < 96]
        df = df.drop(
            columns=[
                "direction",
                "pFdate_version",
                "profileCategory",
                "determinedConsumption",
                "pos",
                "resolution",
                "profileStatus_quality",
            ],
            errors="ignore",
        )
        result = df.pivot(index="Versienr", columns="profiles", values="qnt")
        result["year_created"] = result.index.strftime("%Y-%m-%d")
        return result

    def read_batch(self) -> pd.DataFrame:
        self.pre_read_validation()
        return self._prepare_data()

    def read_stream(self):
        raise NotImplementedError(
            "MFFBAS connector does not support the stream operation."
        )


def to_spark(spark: SparkSession, pdf: pd.DataFrame, reset_index: bool = True) -> DataFrame:
    """Lift a driver-side source result into a Spark frame so it can be
    broadcast-joined against fact tables (the engine-side replacement for
    the reference's PYTHON system type staying pandas-only)."""
    if reset_index and pdf.index.name is not None:
        pdf = pdf.reset_index()
    return spark.createDataFrame(pdf)


class EVMContractDestination:
    """EVM smart-contract write destination
    (destinations/blockchain/evm.py:21-160): builds a contract function
    transaction, signs it, sends it, waits for the receipt, returns the tx
    hash hex. The web3 client is injected via ``web3_factory(url) ->
    web3-like`` (the reference constructs ``Web3(Web3.HTTPProvider(url))``,
    evm.py:92); the object must expose the ``eth`` surface used below.
    """

    def __init__(
        self,
        url: str,
        account: str,
        private_key: str,
        abi: str,
        contract: str | None = None,
        function_name: str | None = None,
        function_params: tuple | None = None,
        transaction: dict | None = None,
        web3_factory: Callable[[str], Any] | None = None,
    ) -> None:
        import json

        self.url = url
        self.account = account
        self.private_key = private_key
        self.abi = json.loads(abi) if isinstance(abi, str) else abi
        self.contract = contract
        self.function_name = function_name
        self.function_params = function_params or ()
        self.transaction = dict(transaction or {})
        self.web3 = _require_injected(web3_factory, "web3_factory", type(self).__name__)(url)

    def pre_write_validation(self) -> bool:
        return True

    def post_write_validation(self) -> bool:
        return True

    def _process_transaction(self) -> None:
        # fill the nonce exactly like the reference (evm.py:113-118)
        if "nonce" not in self.transaction:
            self.transaction["nonce"] = self.web3.eth.get_transaction_count(self.account)
        if "from" not in self.transaction:
            self.transaction["from"] = self.account

    def write_batch(self) -> str:
        """Send one contract-function transaction; returns the tx hash hex
        (evm.py:120-158)."""
        contract = self.web3.eth.contract(address=self.contract, abi=self.abi)
        self._process_transaction()
        tx = getattr(contract.functions, self.function_name)(
            *self.function_params
        ).build_transaction(self.transaction)
        signed_tx = self.web3.eth.account.sign_transaction(tx, self.private_key)
        tx_hash = self.web3.eth.send_raw_transaction(signed_tx.rawTransaction)
        self.web3.eth.wait_for_transaction_receipt(tx_hash)
        return self.web3.to_hex(tx_hash)

    def write_stream(self):
        raise NotImplementedError(
            "EVMContractDestination does not support the stream operation."
        )
