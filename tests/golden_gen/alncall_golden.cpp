// Debug fixture: run the reference's Aligner::align (ssw_cpp wrapper path)
// on query/ref pairs from stdin ("query<TAB>ref" per line); prints
// score, ref_start, ref_end, query_start, query_end, edits, cigar.
#include <iostream>
#include <string>
#include "aligner.hpp"

int main() {
    AlignmentParameters ap{2, 8, 12, 1, 10};
    Aligner aligner(ap);
    std::string line;
    while (std::getline(std::cin, line)) {
        auto tab = line.find('\t');
        std::string q = line.substr(0, tab), r = line.substr(tab + 1);
        auto info = aligner.align(q, r);
        std::cout << info.sw_score << " " << info.ref_start << " "
                  << info.ref_end << " " << info.query_start << " "
                  << info.query_end << " " << info.edit_distance << " "
                  << info.cigar.to_string() << "\n";
    }
}
