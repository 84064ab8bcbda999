#!/bin/bash
# Thin wrapper matching the reference's scripts/union_xena.sh surface
# (/root/reference/xena_gdc_etl/scripts/union_xena.sh:1): combine Xena
# matrices by shared header row, i.e. grow vertically (the reference's
# two-pass awk). Delegates to the engine's merge-xena subcommand — see
# join_xena.sh for why both axes share one distributed code path.
set -e

usage () {
    echo 'Combine Xena matrices by shared header row (column name), i.e. grow vertically.'
    echo 'usage: union_xena.sh [-h] [-o OUTPUT] file [file ...]'
    echo ' -o, --output OUTPUT    path to output file, including filename. Directory must'
    echo '                        exist and file must not exist (no overwriting).'
    exit 0
}

files=()
output=""
while [[ $# -gt 0 ]]; do
    case "$1" in
        -o|--output)
            if [ -e "$2" ]; then
                echo "Output file $2 exist! Overwrite is not supported."; usage
            fi
            if [ ! -d "$(dirname "$2")" ]; then
                echo "Output directory $(dirname "$2") doesn't exist!"; usage
            fi
            output="$2"; shift 2 ;;
        -h|--help) usage ;;
        *) files+=("$1"); shift ;;
    esac
done
[ -n "$output" ] && [ "${#files[@]}" -gt 0 ] || usage

exec python -m xena_gdc_etl_spark.cli merge-xena \
    -f "${files[@]}" -t merged -o "$(dirname "$output")" -n "$(basename "$output")"
