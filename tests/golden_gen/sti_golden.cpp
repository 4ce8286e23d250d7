// Test-fixture generator: builds a strobemer index with the *reference*
// implementation and writes a .sti file, for byte-identity comparison with
// rabbitsalign_tpu's index writer. Reads FASTA path, output path, f and
// read-length from argv.
//
// Usage: sti_golden <ref.fa> <out.sti> <f> <read_length> [diag.csv]
// The optional 5th argument also writes the reference's
// --index-statistics CSV (StrobemerIndex::print_diagnostics) for
// byte-comparison with index/diagnostics.py.

#include <cstdio>
#include <cstdlib>
#include <string>

#include "/root/reference/src/refs.hpp"
#include "/root/reference/src/index.hpp"

int main(int argc, char** argv) {
    if (argc < 5) {
        fprintf(stderr, "usage: sti_golden ref.fa out.sti f read_length\n");
        return 1;
    }
    auto refs = References::from_fasta(argv[1]);
    float f = atof(argv[3]);
    int r = atoi(argv[4]);
    IndexParameters params = IndexParameters::from_read_length(r);
    StrobemerIndex index(refs, params);
    index.populate(f, 1);
    index.write(argv[2]);
    if (argc > 5) index.print_diagnostics(argv[5], params.syncmer.k);
    printf("bits %d filter_cutoff %u size %zu\n", index.get_bits(), index.filter_cutoff, index.size());
    return 0;
}
