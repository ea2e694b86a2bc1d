"""Session/configuration + cloud-side utilities — the engine's equivalents
of the reference's ``pipelines/utilities`` family that the maintenance
module does not already cover (maintenance.py = table create/optimize/
vacuum).

Cloud clients are INJECTED (same policy as sources.iso / python_sources):
the reference constructs boto3 clients inline (s3_bucket_policy.py:114-118,
s3_copy_utility.py:118); here the caller passes the client, tests pass
fakes, and the pure policy-document logic is separately callable.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Callable

from pyspark.sql import SparkSession

from .data_models import validate_uri

_S3_SCHEMES = ("s3://", "s3a://")


def set_spark_configuration(spark: SparkSession, config: dict) -> bool:
    """Apply key/value pairs to a live session's runtime conf
    (utilities/spark/configuration.py:79-95, SparkConfigurationUtility)."""
    for key, value in config.items():
        spark.conf.set(key, value)
    return True


def adls_gen2_spn_connect(
    spark: SparkSession,
    storage_account: str,
    tenant_id: str,
    client_id: str,
    client_secret: str,
) -> bool:
    """Configure OAuth service-principal access to an ADLS Gen2 account
    (utilities/spark/adls_gen2_spn_connect.py:93-120) — the five standard
    hadoop-azure ``fs.azure.account`` settings, applied to the session."""
    suffix = f"{storage_account}.dfs.core.windows.net"
    return set_spark_configuration(
        spark,
        {
            f"fs.azure.account.auth.type.{suffix}": "OAuth",
            f"fs.azure.account.oauth.provider.type.{suffix}": (
                "org.apache.hadoop.fs.azurebfs.oauth2.ClientCredsTokenProvider"
            ),
            f"fs.azure.account.oauth2.client.id.{suffix}": client_id,
            f"fs.azure.account.oauth2.client.secret.{suffix}": client_secret,
            f"fs.azure.account.oauth2.client.endpoint.{suffix}": (
                f"https://login.microsoftonline.com/{tenant_id}/oauth2/token"
            ),
        },
    )


def merge_bucket_policy_statement(
    policy: dict | None,
    sid: str,
    effect: str,
    principal: str | dict,
    action: list[str],
    resource: list[str],
) -> dict:
    """Merge one Sid's statement into an S3 bucket policy document — the
    pure core of S3BucketPolicyUtility (s3_bucket_policy.py:121-156).

    Matching Sid: effect/principal/action are replaced and the resource
    lists are unioned. (The reference's list-branch ``statement["Resource"]
    + self.resource`` discards its result — existing list-valued resources
    lose the new entries; the union here is applied in both branches.)
    Missing policy starts the AWS-documented empty document.
    """
    if policy is None:
        policy = {"Version": "2012-10-17", "Statement": []}
    for statement in policy["Statement"]:
        if statement.get("Sid") == sid:
            statement["Effect"] = effect
            statement["Principal"] = principal
            statement["Action"] = action
            existing = statement.get("Resource", [])
            if not isinstance(existing, list):
                existing = [existing]
            statement["Resource"] = sorted(set(existing) | set(resource))
            return policy
    policy["Statement"].append(
        {
            "Sid": sid,
            "Effect": effect,
            "Principal": principal,
            "Action": action,
            "Resource": list(resource),
        }
    )
    return policy


def apply_bucket_policy(
    s3_client: Any,
    bucket_name: str,
    sid: str,
    effect: str,
    principal: str | dict,
    action: list[str],
    resource: list[str],
) -> bool:
    """get_bucket_policy → merge → put_bucket_policy
    (s3_bucket_policy.py:112-162) with an injected boto3-like client."""
    current = s3_client.get_bucket_policy(Bucket=bucket_name)
    existing = None
    if "Policy" in current and current["Policy"] is not None:
        existing = json.loads(current["Policy"])
    merged = merge_bucket_policy_statement(
        existing, sid, effect, principal, action, resource
    )
    s3_client.put_bucket_policy(Bucket=bucket_name, Policy=json.dumps(merged))
    return True


def _s3_parts(uri: str) -> tuple[str, str]:
    _, bucket, path = validate_uri(uri)
    return bucket, path.lstrip("/")


def s3_copy(
    source_uri: str,
    destination_uri: str,
    s3: Any,
    source_version_id: str | None = None,
    extra_args: dict | None = None,
    callback: Callable | None = None,
    source_client: Any | None = None,
    transfer_config: Any | None = None,
) -> bool:
    """Copy between S3 URIs / local paths (s3_copy_utility.py:103-178):
    S3→S3 uses the server-side transfer ``copy``, local→S3 uploads,
    S3→local downloads. ``s3`` is an injected boto3-like resource exposing
    ``meta.client`` (copy/upload_file/download_file); errors are logged and
    reported as False like the reference.
    """
    src_is_s3 = source_uri.startswith(_S3_SCHEMES)
    dst_is_s3 = destination_uri.startswith(_S3_SCHEMES)
    client = s3.meta.client if hasattr(s3, "meta") else s3
    try:
        if src_is_s3 and dst_is_s3:
            src_bucket, src_key = _s3_parts(source_uri)
            dst_bucket, dst_key = _s3_parts(destination_uri)
            copy_source = {"Bucket": src_bucket, "Key": src_key}
            if source_version_id is not None:
                copy_source["VersionId"] = source_version_id
            client.copy(
                copy_source, dst_bucket, dst_key,
                extra_args, callback, source_client, transfer_config,
            )
        elif os.path.isfile(source_uri) and dst_is_s3:
            dst_bucket, dst_key = _s3_parts(destination_uri)
            client.upload_file(source_uri, dst_bucket, dst_key)
        elif src_is_s3 and not dst_is_s3:
            src_bucket, src_key = _s3_parts(source_uri)
            client.download_file(src_bucket, src_key, destination_uri)
        else:
            raise SystemError(
                f"Unsupported copy: {source_uri} -> {destination_uri} "
                f"(need at least one s3:// side or an existing local file)"
            )
    except SystemError:
        raise
    except Exception as ex:  # noqa: BLE001 — reference logs + returns False
        logging.error(ex)
        return False
    return True
