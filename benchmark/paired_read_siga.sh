#!/bin/sh
#
# Paired-read assembly benchmark driver (equivalent of
# /root/reference/benchmark/paired_read_siga.sh): preprocess -> index ->
# overlap -> pe-assemble, then rmdup + re-assemble the contigs, then evaluate
# with contigs_mapping.py.
#
CWD=$(dirname "$(readlink -f "$0")")

if [ -z "${siga_main}" ]; then
    siga_main="${CWD}/../siga"
fi

coverage=50
sigma=150
insert_size=1000
read_len=150

help() {
    echo "usage: $(basename "$0") -p <dirname> -r <datadir> -x <insert_size> -c <coverage> -d <sigma> -l <read_length>"
    exit "$1"
}

while getopts 'p:r:x:c:d:l:h' OPT; do
    case $OPT in
        p) dirname="${OPTARG}";;
        r) datadir="${OPTARG}";;
        x) insert_size="${OPTARG}";;
        c) coverage="${OPTARG}";;
        d) sigma="${OPTARG}";;
        l) read_len="${OPTARG}";;
        h) help 0;;
        *) help 1;;
    esac
done

[ -z "${dirname}" ] && help 1
[ -z "${datadir}" ] && help 1

R1="${datadir}/read_${read_len}_${coverage}_${insert_size}_${sigma}_paired_R1"
R2="${datadir}/read_${read_len}_${coverage}_${insert_size}_${sigma}_paired_R2"
f="${dirname}/read_${read_len}_${coverage}_${insert_size}_${sigma}_paired_R"

mkdir -p "${dirname}"
set -e

# Assemble paired reads
${siga_main} preprocess --pe-mode=1 --pe-orientation=ff --no-primer-check -o "${f}.fastq" "${R1}.fasta" "${R2}.fasta"
${siga_main} index -p "${f}" "${f}.fastq"
${siga_main} overlap -m 100 --no-opposite-strand -p "${f}" "${f}.fastq"
${siga_main} assemble -m 100 --pe-mode=1 --max-distance=100 -p "${f}" "${f}.asqg.gz"

# Assemble simple contigs
${siga_main} index -p "${f}-contigs" "${f}-contigs.fa"
${siga_main} rmdup -p "${f}-contigs" "${f}-contigs.fa"
${siga_main} index -p "${f}-contigs.rmdup" "${f}-contigs.rmdup.fa"
${siga_main} overlap -m 10 --no-opposite-strand -p "${f}-contigs.rmdup" "${f}-contigs.rmdup.fa"
${siga_main} assemble --pe-mode=0 -m 100 -p "${f}-contigs.rmdup" "${f}-contigs.rmdup.asqg.gz"

# Evaluate
python3 "${CWD}/contigs_mapping.py" 300 "${datadir}/new_ref.fa" fasta \
    "${dirname}/unmatched_contigs_${read_len}_${coverage}_${insert_size}_${sigma}" \
    < "${f}-contigs.rmdup-contigs.fa" \
    > "${dirname}/siga-contigs_${read_len}_${coverage}_${insert_size}_${sigma}.stats"

cat "${dirname}/siga-contigs_${read_len}_${coverage}_${insert_size}_${sigma}.stats"
