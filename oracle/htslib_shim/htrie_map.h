/* Minimal stand-in for tsl::htrie_map with the interface arriba uses
 * (insert by C string returning (iterator, inserted), erase by iterator,
 * dereference yielding the mapped value). Backed by std::unordered_map. */
#ifndef SHIM_HTRIE_MAP_H
#define SHIM_HTRIE_MAP_H

#include <string>
#include <unordered_map>
#include <utility>

namespace tsl {

template <class CharT, class T>
class htrie_map {
    typedef std::unordered_map<std::basic_string<CharT>, T> map_type;
    map_type map_;

public:
    class iterator {
        typename map_type::iterator it_;
    public:
        explicit iterator(typename map_type::iterator it) : it_(it) {}
        T &operator*() { return it_->second; }
        typename map_type::iterator raw() const { return it_; }
    };

    std::pair<iterator, bool> insert(const CharT *key, const T &value) {
        std::pair<typename map_type::iterator, bool> result =
            map_.insert(std::make_pair(std::basic_string<CharT>(key), value));
        return std::make_pair(iterator(result.first), result.second);
    }

    void erase(const iterator &it) { map_.erase(it.raw()); }
    bool empty() const { return map_.empty(); }
    size_t size() const { return map_.size(); }
};

}  // namespace tsl

#endif /* SHIM_HTRIE_MAP_H */
